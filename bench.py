"""Benchmark: on-device AIRSPACE encode throughput on real TPU hardware.

Measures the fused device encoder (preprocess -> Golomb codewords ->
doubling-tree bit-pack -> framed stream) on AIRS-like detector frames with
the headline config (DIFF + GOLOMB_ZERO, the reference's recommended
science setup), plus decode throughput as a secondary number printed to
stderr.

Prints ONE JSON line to stdout:
    {"metric": "encode_gbps_per_chip", "value": N, "unit": "GB/s",
     "vs_baseline": R}

``vs_baseline``: the reference publishes no numbers, so this repo
established the baseline itself (BASELINE.md "Established baseline"): the
unmodified reference C encoder at gcc -O3 runs 0.173 GB/s on one CPU core
for this exact workload and config (identical output bytes).
vs_baseline = value / 0.173.  The north-star target share per chip
(10 GB/s aggregate / 8 chips = 1.25) is logged to stderr for context.

Timing method: the measurement loop runs INSIDE one jitted computation
(lax.fori_loop with a serial data dependency between iterations), so the
wall time of a single dispatch covers exactly n_iter sequential encodes —
robust against async-dispatch artifacts and host<->device link latency.
Fixed overhead is removed by differencing two loop lengths.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compile cache: the axon remote-compile tunnel is slow; warm
# caches make repeated bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/airs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from airs_compression_tpu.format.params import CmpParams, EncoderType, Preprocessing
from airs_compression_tpu.ops.encode import (
    _encode_one_pass,
    make_pass_config,
    worst_case_words,
)

REFERENCE_C_GBPS = 0.173  # reference encoder, gcc -O3, 1 CPU core (BASELINE.md)
TARGET_PER_CHIP = 1.25    # GB/s; 10 GB/s aggregate / 8 chips (BASELINE.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_encode_loop(cfg, n_words, B, N, n_iter):
    @jax.jit
    def loop(x, seq, ids, csum):
        def body(i, carry):
            # serial dependency: mix one output word back into the input;
            # reducing over ALL output words keeps the full frame alive
            # against dead-code elimination
            x2 = x ^ (carry[:, None] & jnp.int32(1))
            words, sizes = _encode_one_pass(
                cfg, x2, x2, seq, ids, ids, csum, n_words)
            return (jnp.sum(words, axis=-1, dtype=jnp.uint32)
                    .astype(jnp.int32) + sizes)

        c = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((B,), jnp.int32))
        return c[:2]

    return loop


def timed(fn, *args):
    t0 = time.time()
    out = np.asarray(fn(*args))
    return time.time() - t0, out


class _Timeout(Exception):
    pass


def _alarm(seconds):
    import signal

    def handler(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _measure_encode(cfg, B, N):
    n_words = worst_case_words(cfg, N)
    gb = B * N * 2 / 1e9
    rng = np.random.default_rng(0)
    frames = ((1100 + rng.normal(0, 6, (B, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    seq = jnp.zeros((B,), jnp.int32)
    ids = jnp.zeros((B,), jnp.uint32)
    csum = jnp.zeros((B,), jnp.uint32)

    # Differencing over a long serial loop: per-iteration time is small
    # relative to the ~20ms axon dispatch overhead, so the loop must be
    # long enough that the difference dominates the noise.  Median of 3.
    n_lo, n_hi = 1, 129
    f_lo = make_encode_loop(cfg, n_words, B, N, n_lo)
    f_hi = make_encode_loop(cfg, n_words, B, N, n_hi)
    timed(f_lo, x, seq, ids, csum)  # warm/compile
    timed(f_hi, x, seq, ids, csum)
    samples = []
    for _ in range(3):
        t_lo, _ = timed(f_lo, x, seq, ids, csum)
        t_hi, _ = timed(f_hi, x, seq, ids, csum)
        per_iter = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
        log(f"encode B={B} N={N}: lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms "
            f"-> {per_iter*1e3:.3f} ms/iter, {gb/per_iter:.2f} GB/s")
        samples.append(per_iter)
    med = sorted(samples)[len(samples) // 2]
    return gb / med, (x, seq, ids, csum, n_words)


def main():
    import signal

    log(f"devices: {jax.devices()}")
    params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                       primary_encoder_type=EncoderType.GOLOMB_ZERO,
                       primary_encoder_param=4)
    cfg = make_pass_config(params, False, True)

    encode_gbps = 0.0
    handles = None
    for B, N, budget in ((512, 8192, 420), (64, 4096, 120)):
        try:
            _alarm(budget)
            encode_gbps, handles = _measure_encode(cfg, B, N)
            signal.alarm(0)
            break
        except _Timeout:
            log(f"encode measurement timed out at B={B} N={N}; retrying smaller")
        finally:
            signal.alarm(0)
    if handles is None:
        print(json.dumps({"metric": "encode_gbps_per_chip", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0}))
        return
    x, seq, ids, csum, n_words = handles
    B, N = x.shape

    rng = np.random.default_rng(0)

    # secondary: compressed ratio on this data (device result, exact)
    words, sizes = jax.jit(
        lambda x: _encode_one_pass(cfg, x, x, seq, ids, ids, csum, n_words)
    )(x)
    ratio = float(B * N * 2) / float(np.asarray(sizes).sum())
    log(f"compression ratio on AIRS-like frames: {ratio:.2f}x")

    # correctness gate: the timed kernel's frames must be byte-identical to
    # the host codec (itself oracle-verified against the reference C lib);
    # a fast-but-wrong kernel must never post a number
    from airs_compression_tpu.engine.context import CmpContext, set_timestamp_func

    w_np, s_np = np.asarray(words), np.asarray(sizes)
    frames_u16 = (np.asarray(x).astype(np.uint16))
    set_timestamp_func(lambda: (0, 0))
    try:
        for i in range(4):
            ref = CmpContext(params).compress_u16(frames_u16[i])
            dev = w_np[i].astype(">u4").tobytes()[: int(s_np[i])]
            if dev != ref:
                log(f"CORRECTNESS FAILURE: device frame {i} != host codec")
                print(json.dumps({"metric": "encode_gbps_per_chip",
                                  "value": 0.0, "unit": "GB/s",
                                  "vs_baseline": 0.0}))
                return
    finally:
        set_timestamp_func(None)
    log("correctness gate: device frames byte-identical to host codec")

    # secondary: decode throughput (sequential per block, parallel across)
    try:
        _alarm(240)
        dec_B, dec_N = 1024, 1024
        dcfg = cfg
        dn_words = worst_case_words(dcfg, dec_N)
        dframes = ((1100 + rng.normal(0, 6, (dec_B, dec_N))).astype(np.int64)
                   & 0xFFFF).astype(np.uint16)
        dx = jnp.asarray(dframes.view(np.int16), jnp.int32)
        dwords, _ = jax.jit(lambda x: _encode_one_pass(
            dcfg, x, x, jnp.zeros((dec_B,), jnp.int32),
            jnp.zeros((dec_B,), jnp.uint32), jnp.zeros((dec_B,), jnp.uint32),
            jnp.zeros((dec_B,), jnp.uint32), dn_words))(dx)
        from airs_compression_tpu.ops.decode import decode_blocks_device

        # correctness gate: the timed decoder must round-trip the frames
        dsamp, _ = jax.jit(lambda w: decode_blocks_device(
            dcfg, w, dx, dec_N))(dwords)
        if not np.array_equal(np.asarray(dsamp), np.asarray(dx)):
            raise AssertionError("device decode round-trip mismatch")
        log("correctness gate: device decode round-trips")

        def make_dec_loop(n_iter):
            @jax.jit
            def loop(w):
                def body(i, carry):
                    w2 = w ^ (carry[:, None] & jnp.uint32(1))
                    s, e = decode_blocks_device(dcfg, w2, dx, dec_N)
                    return e.astype(jnp.uint32)

                return jax.lax.fori_loop(
                    0, n_iter, body, jnp.zeros((dec_B,), jnp.uint32))[:2]

            return loop

        n_lo, n_hi = 1, 65
        g_lo, g_hi = make_dec_loop(n_lo), make_dec_loop(n_hi)
        timed(g_lo, dwords)
        timed(g_hi, dwords)
        dsamples = []
        for _ in range(3):
            t_lo, _ = timed(g_lo, dwords)
            t_hi, _ = timed(g_hi, dwords)
            dsamples.append(max((t_hi - t_lo) / (n_hi - n_lo), 1e-9))
        dgb = dec_B * dec_N * 2 / 1e9
        dper = sorted(dsamples)[1]
        log(f"decode: {dper*1e3:.3f} ms/iter -> {dgb/dper:.2f} GB/s")
    except (Exception, _Timeout) as e:  # decode bench is informational only
        log(f"decode bench skipped: {type(e).__name__} {e}")
    finally:
        import signal as _sig
        _sig.alarm(0)

    log(f"target share: {encode_gbps / TARGET_PER_CHIP:.1f}x of "
        f"{TARGET_PER_CHIP} GB/s/chip (10 GB/s aggregate on v5e-8)")
    print(json.dumps({
        "metric": "encode_gbps_per_chip",
        "value": round(encode_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(encode_gbps / REFERENCE_C_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
