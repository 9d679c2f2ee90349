"""Benchmark: on-device AIRSPACE encode/decode throughput on real TPU hardware.

Measures the fused device encoder (preprocess -> Golomb codewords ->
doubling-tree bit-pack -> framed stream) and the Pallas lockstep decoder
on AIRS-like detector frames with the headline config (DIFF + GOLOMB_ZERO,
the reference's recommended science setup).

Prints ONE JSON line to stdout (as the last line):
    {"metric": "encode_gbps_per_chip", "value": N, "unit": "GB/s",
     "vs_baseline": R, "decode_gbps": D, "ratio": C,
     "hw_verified_configs": K}

``vs_baseline``: the reference publishes no numbers, so this repo
established the baseline itself (BASELINE.md "Established baseline"): the
unmodified reference C encoder at gcc -O3 runs 0.173 GB/s on one CPU core
for this exact workload and config (identical output bytes).
vs_baseline = value / 0.173.  The north-star target share per chip
(10 GB/s aggregate / 8 chips = 1.25) is logged to stderr for context.

Robustness design (round-1 postmortem): under the axon remote-compile
tunnel a single Pallas program can take 30-400 s to compile, and the cost
is unpredictable.  Therefore:

* Exactly ONE jitted program per direction.  The measurement loop takes
  the trip count as a *traced* argument (lax.fori_loop with dynamic
  bounds), so the same compiled program serves the correctness gate
  (n_iter=1 returns the exact frames) and both timing points.
* Timing alarms are armed only around *execution*; compilation runs under
  a generous watchdog with an XLA-packer fallback program, so a slow
  compile degrades the number instead of zeroing it.
* Decode input is produced by the host codec (oracle-anchored), costing
  zero extra device programs.
* The persistent JAX compile cache lives in the repo (.jax_cache) so a
  driver run after this round starts warm; /tmp is not relied upon.
* Correctness gates run before any number is accepted: encoded frames
  must be byte-identical to the host codec (itself differential-tested
  against the unmodified reference C library), and the timed decoder must
  round-trip.  A fast-but-wrong kernel never posts a number.
"""

import json
import os
import pathlib
import signal
import sys
import time

import numpy as np

T0 = time.time()
REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

def _cpu_fingerprint() -> str:
    """Host CPU feature hash: jax loads cached XLA AOT executables even
    when machine features mismatch (observed SIGSEGV after a VM host
    migration), so the cache directory is keyed by CPU model."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


_CACHE = os.environ.get(
    "AIRS_BENCH_CACHE", str(REPO / f".jax_cache_{_cpu_fingerprint()}"))
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from airs_compression_tpu.format.params import CmpParams, EncoderType, Preprocessing
from airs_compression_tpu.ops.encode import (
    _encode_one_pass,
    make_pass_config,
    worst_case_words,
)

REFERENCE_C_GBPS = 0.173  # reference encoder, gcc -O3, 1 CPU core (BASELINE.md)
TARGET_PER_CHIP = 1.25    # GB/s; 10 GB/s aggregate / 8 chips (BASELINE.md)

# Total wall budget; essentials typically finish far earlier.  Optional
# stages check remaining() before starting.
DEADLINE_S = float(os.environ.get("AIRS_BENCH_DEADLINE", "2400"))

RESULT = {"metric": "encode_gbps_per_chip", "value": 0.0, "unit": "GB/s",
          "vs_baseline": 0.0}
_EMITTED = False


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit_final():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)


def _sigterm(signum, frame):
    log(f"signal {signum}: emitting best-so-far result")
    emit_final()
    sys.exit(0)


signal.signal(signal.SIGTERM, _sigterm)
signal.signal(signal.SIGINT, _sigterm)


def remaining() -> float:
    return DEADLINE_S - (time.time() - T0)


class _Timeout(Exception):
    pass


def _alarm_handler(signum, frame):
    raise _Timeout()


signal.signal(signal.SIGALRM, _alarm_handler)


def with_alarm(seconds, fn, *args):
    """Run fn under a SIGALRM watchdog; raises _Timeout."""
    signal.alarm(max(1, int(seconds)))
    try:
        return fn(*args)
    finally:
        signal.alarm(0)


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    out = jax.tree_util.tree_map(np.asarray, out)
    return time.time() - t0, out


def headline_params() -> CmpParams:
    return CmpParams(primary_preprocessing=Preprocessing.DIFF,
                     primary_encoder_type=EncoderType.GOLOMB_ZERO,
                     primary_encoder_param=4)


def make_frames(B, N, seed=0):
    rng = np.random.default_rng(seed)
    return ((1100 + rng.normal(0, 6, (B, N))).astype(np.int64)
            & 0xFFFF).astype(np.uint16)


def make_encode_loop(cfg, n_words, B, N, cap_bits=None):
    """One program: dynamic-trip-count serial encode loop.

    Returns (acc, words, sizes, pack_ok) of the final iteration.
    Iteration 0 sees the unmodified input (carry starts at 0), so n_iter=1
    yields the exact encoder output for the correctness gate; larger
    n_iter chains a serial data dependency (flip bit 0 of every sample by
    a parity of the prior output) so XLA cannot collapse the loop.
    ``cap_bits`` selects the entropy-clamped Pallas packer; the gate
    checks ``pack_ok`` so a clamp overflow can never post a number.
    """
    seq = jnp.zeros((B,), jnp.int32)
    ids = jnp.zeros((B,), jnp.uint32)
    csum = jnp.zeros((B,), jnp.uint32)

    @jax.jit
    def loop(x, n_iter):
        def body(i, carry):
            acc = carry[0]
            x2 = x ^ (acc[:, None] & jnp.int32(1))
            if cap_bits is not None:
                words, sizes, ok = _encode_one_pass(
                    cfg, x2, x2, seq, ids, ids, csum, n_words,
                    cap_bits=cap_bits)
            else:
                words, sizes = _encode_one_pass(cfg, x2, x2, seq, ids, ids,
                                                csum, n_words)
                ok = jnp.ones((B,), bool)
            acc2 = (jnp.sum(words, axis=-1, dtype=jnp.uint32)
                    .astype(jnp.int32) + sizes + ok.astype(jnp.int32))
            return (acc2, words, sizes, ok)

        init = (jnp.zeros((B,), jnp.int32),
                jnp.zeros((B, n_words), jnp.uint32),
                jnp.zeros((B,), jnp.int32),
                jnp.ones((B,), bool))
        return jax.lax.fori_loop(0, n_iter, body, init)

    return loop


def measure_loop(loop_fn, first_arg, n_lo, n_hi, reps=5):
    """Median per-iteration time via two-trip-count differencing."""
    samples = []
    for _ in range(reps):
        t_lo, _ = timed(lambda: loop_fn(first_arg, n_lo)[0])
        t_hi, _ = timed(lambda: loop_fn(first_arg, n_hi)[0])
        samples.append(max((t_hi - t_lo) / (n_hi - n_lo), 1e-9))
        log(f"  lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms -> "
            f"{samples[-1]*1e3:.3f} ms/iter")
    return sorted(samples)[len(samples) // 2]


def stage_encode():
    """Headline encode number + byte-exactness gate.  Returns handles."""
    from airs_compression_tpu.ops.encode import default_cap_bits

    from airs_compression_tpu.ops.encode import clamped_frame_words

    B, N = 512, 8192
    params = headline_params()
    cfg = make_pass_config(params, False, True)
    n_words_full = worst_case_words(cfg, N)
    frames = make_frames(B, N)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)

    cap = default_cap_bits(cfg)
    # entropy-sized frame buffer: valid whenever pack_ok holds (gated below)
    n_words = clamped_frame_words(cfg, N, cap)
    log(f"encode pack cap_bits={cap} (worst {cfg.worst_bits_per_sample}), "
        f"frame words {n_words} (worst {n_words_full})")
    loop = make_encode_loop(cfg, n_words, B, N, cap_bits=cap)
    try:
        budget = min(max(remaining() - 600, 120), 1200)
        log(f"compiling encode loop (watchdog {budget:.0f}s)...")
        t0 = time.time()
        _, words, sizes, pack_ok = with_alarm(
            budget, lambda: jax.tree_util.tree_map(np.asarray, loop(x, 1)))
        log(f"encode loop compiled+ran in {time.time()-t0:.1f}s")
        if cap is not None and not pack_ok.all():
            log(f"entropy clamp overflowed {int((~pack_ok).sum())} blocks; "
                "recompiling at full capacity")
            cap = None
            n_words = n_words_full
            loop = make_encode_loop(cfg, n_words, B, N)
            _, words, sizes, pack_ok = with_alarm(
                min(max(remaining() - 300, 120), 900),
                lambda: jax.tree_util.tree_map(np.asarray, loop(x, 1)))
    except _Timeout:
        log("Pallas encode compile timed out; falling back to XLA packer")
        os.environ["AIRS_TPU_PACKER"] = "xla"
        cap = None
        n_words = n_words_full
        loop = make_encode_loop(cfg, n_words, B, N)
        budget = min(max(remaining() - 240, 120), 900)
        _, words, sizes, pack_ok = with_alarm(
            budget, lambda: jax.tree_util.tree_map(np.asarray, loop(x, 1)))
    RESULT["pack_cap_bits"] = cap

    # correctness gate: device frames byte-identical to the host codec
    from airs_compression_tpu.engine.context import CmpContext, set_timestamp_func

    set_timestamp_func(lambda: (0, 0))
    try:
        for i in range(4):
            ref = CmpContext(params).compress_u16(frames[i])
            dev = words[i].astype(">u4").tobytes()[: int(sizes[i])]
            if dev != ref:
                log(f"CORRECTNESS FAILURE: device frame {i} != host codec")
                return None
    finally:
        set_timestamp_func(None)
    log("correctness gate: device frames byte-identical to host codec")

    gb = B * N * 2 / 1e9
    per_iter = with_alarm(min(remaining(), 180),
                          measure_loop, loop, x, 1, 2049, 5)
    gbps = gb / per_iter
    ratio = float(B * N * 2) / float(sizes.sum())
    log(f"encode B={B} N={N}: {per_iter*1e3:.3f} ms/iter -> {gbps:.2f} GB/s"
        f" (ratio {ratio:.2f}x)")
    RESULT["value"] = round(gbps, 3)
    RESULT["vs_baseline"] = round(gbps / REFERENCE_C_GBPS, 3)
    RESULT["ratio"] = round(ratio, 3)
    return True


def stage_decode():
    """Decode throughput + round-trip gate (Pallas lockstep decoder)."""
    from airs_compression_tpu.engine.context import CmpContext, set_timestamp_func
    from airs_compression_tpu.ops.pallas_decode import decode_blocks_pallas

    from airs_compression_tpu.ops.encode import clamped_frame_words, default_cap_bits

    B, N, REP = 1024, 1024, 4
    params = headline_params()
    cfg = make_pass_config(params, False, True)
    # streams live in entropy-sized buffers (the clamped encoder's output
    # format); fall back to worst-case width if any stream doesn't fit
    n_words = clamped_frame_words(cfg, N, default_cap_bits(cfg))

    # host-encode B//REP unique frames, tile to B (zero device programs)
    frames_u = make_frames(B // REP, N, seed=1)
    raws = []
    set_timestamp_func(lambda: (0, 0))
    try:
        for f in frames_u:
            raws.append(CmpContext(params).compress_u16(f))
    finally:
        set_timestamp_func(None)
    if max(len(r) for r in raws) > n_words * 4:
        n_words = worst_case_words(cfg, N)
    log(f"decode frame words {n_words} (worst {worst_case_words(cfg, N)})")
    w_np = np.zeros((B // REP, n_words), np.uint32)
    for i, raw in enumerate(raws):
        raw = raw + b"\0" * (n_words * 4 - len(raw))
        w_np[i] = np.frombuffer(raw, ">u4").astype(np.uint32)
    frames = np.tile(frames_u, (REP, 1))
    words = jnp.asarray(np.tile(w_np, (REP, 1)))
    x_ref = frames.view(np.int16).astype(np.int32)
    xj = jnp.asarray(x_ref)

    @jax.jit
    def loop(w, n_iter):
        def body(i, carry):
            acc, _, _ = carry
            w2 = w ^ (acc[:, None] & jnp.uint32(1))
            s, e = decode_blocks_pallas(cfg, w2, xj, N)
            acc2 = (jnp.sum(s.astype(jnp.uint32), axis=-1)
                    + e.astype(jnp.uint32))
            return (acc2, s, e)

        init = (jnp.zeros((B,), jnp.uint32),
                jnp.zeros((B, N), jnp.int32),
                jnp.zeros((B,), jnp.int32))
        return jax.lax.fori_loop(0, n_iter, body, init)

    budget = min(max(remaining() - 300, 120), 1200)
    log(f"compiling decode loop (watchdog {budget:.0f}s)...")
    t0 = time.time()
    _, samples, _ = with_alarm(budget, lambda: jax.tree_util.tree_map(
        np.asarray, loop(words, 1)))
    log(f"decode loop compiled+ran in {time.time()-t0:.1f}s")
    if not np.array_equal(samples, x_ref):
        log("CORRECTNESS FAILURE: device decode round-trip mismatch")
        return
    log("correctness gate: device decode round-trips")

    gb = B * N * 2 / 1e9
    per_iter = with_alarm(min(remaining(), 180),
                          measure_loop, loop, words, 1, 1025, 5)
    gbps = gb / per_iter
    log(f"decode B={B} N={N}: {per_iter*1e3:.3f} ms/iter -> {gbps:.2f} GB/s")
    RESULT["decode_gbps"] = round(gbps, 3)


def stage_verify_configs():
    """On-hardware byte-exactness sweep across representative configs."""
    sys.path.insert(0, str(REPO / "tools"))
    import importlib

    vod = importlib.import_module("verify_on_device")
    ok = 0
    for conf in vod.CONFIGS:
        if remaining() < 300:
            log("config sweep: deadline near, stopping early")
            break
        try:
            fails = with_alarm(min(remaining() - 120, 420),
                               vod.run_config, conf, 128, 512)
            if fails == 0:
                ok += 1
            else:
                log(f"config {conf}: {fails} mismatches")
        except _Timeout:
            log(f"config {conf}: compile watchdog expired, skipping")
    RESULT["hw_verified_configs"] = ok


def main():
    log(f"devices: {jax.devices()}  (deadline {DEADLINE_S:.0f}s, "
        f"cache {_CACHE})")
    try:
        if stage_encode() is None:
            emit_final()     # value stays 0.0: correctness gate failed
            return
    except _Timeout:
        log("encode stage timed out entirely")
        emit_final()
        return

    try:
        if remaining() > 300:
            stage_decode()
        else:
            log("skipping decode stage: deadline near")
    except (_Timeout, Exception) as e:  # decode number is secondary
        log(f"decode stage failed: {type(e).__name__} {e}")

    try:
        if remaining() > 360:
            stage_verify_configs()
        else:
            log("skipping config sweep: deadline near")
    except (_Timeout, Exception) as e:
        log(f"config sweep failed: {type(e).__name__} {e}")

    log(f"target share: {RESULT['value'] / TARGET_PER_CHIP:.1f}x of "
        f"{TARGET_PER_CHIP} GB/s/chip (10 GB/s aggregate on v5e-8)")
    emit_final()


if __name__ == "__main__":
    main()
