"""Time-bounded differential fuzz soak: device decode tier vs host oracle.

The CI suite runs a fixed corpus (tests/test_decoder_differential.py);
this tool keeps generating fresh randomized (config, data, mutation)
triples until a wall-time budget expires, asserting the same invariant:
on every input, the batch device tier either matches the host decoder's
samples bit-for-bit or raises ``CmpError`` — never a silent divergence,
never a non-CmpError crash.  Run:

    JAX_PLATFORMS=cpu python tools/fuzz_soak.py [seconds] [seed]

Prints one JSON line: cases run, mutations tried, mismatches (must be 0).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import numpy as np

from airs_compression_tpu import (
    CmpContext,
    CmpError,
    CmpParams,
    EncoderType,
    Preprocessing,
)
from airs_compression_tpu.engine.host import decode_block
from airs_compression_tpu.models.stream import BatchDecompressor


def _random_params(rng) -> CmpParams:
    preps = [Preprocessing.NONE, Preprocessing.DIFF, Preprocessing.IWT]
    encs = [EncoderType.UNCOMPRESSED, EncoderType.GOLOMB_ZERO,
            EncoderType.GOLOMB_MULTI]
    kw = dict(primary_preprocessing=preps[int(rng.integers(0, len(preps)))],
              primary_encoder_type=encs[int(rng.integers(0, len(encs)))],
              checksum_enabled=bool(rng.integers(0, 2)),
              uncompressed_fallback_enabled=bool(rng.integers(0, 2)))
    # bucketed parameters: every distinct (g, outlier) is a fresh XLA
    # compile on the CPU backend, so an unbounded draw exhausts memory
    # long before the time budget (observed); a small ladder still
    # exercises short/long codes, escapes, and clamp edges
    if kw["primary_encoder_type"] != EncoderType.UNCOMPRESSED:
        kw["primary_encoder_param"] = int(rng.choice([1, 2, 4, 7, 33, 255]))
    if kw["primary_encoder_type"] == EncoderType.GOLOMB_MULTI:
        kw["primary_encoder_outlier"] = int(rng.choice([2, 40, 800]))
    return CmpParams(**kw)


def _host_outcome(blobs, n):
    outs = []
    for f in blobs:
        # a seq>0 MODEL block is undecodable for the STATELESS per-block
        # host API (no model state) but legitimate for the batch tier,
        # which carries chain state — skip the comparison for those
        if len(f) >= 16 and (f[15] >> 4) == 3 and f[14] != 0:
            return ("chain", None)
        try:
            s, hdr, _ = decode_block(f)
        except CmpError:
            return ("err", None)
        if hdr.original_size != 2 * n:
            return ("err", None)  # batch API pins N -> SRC_SIZE_MISMATCH
        outs.append(s)
    return ("ok", np.stack(outs))


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    import jax

    rng = np.random.default_rng(seed)
    t0 = time.time()
    cases = mutations = mismatches = 0
    last_clear = t0
    # bucketed shapes so jit compiles amortize across the soak
    shapes = [(2, 64), (4, 96), (3, 256)]
    while time.time() - t0 < budget:
        if time.time() - last_clear > 90:
            # compiled-program memory still accumulates across the
            # config space; LLVM's JIT allocator dies (ENOMEM) long
            # before system RAM runs out, so drop the caches regularly
            jax.clear_caches()
            last_clear = time.time()
        B, n = shapes[int(rng.integers(0, len(shapes)))]
        params = _random_params(rng)
        sigma = float(rng.choice([1.0, 8.0, 200.0, 20000.0]))
        frames = ((1100 + rng.normal(0, sigma, (B, n))).astype(np.int64)
                  & 0xFFFF).astype(np.uint16)
        blobs = [bytes(CmpContext(params).compress_u16(f)) for f in frames]
        cases += 1
        for _ in range(12):
            mutations += 1
            mutated = list(blobs)
            bi = int(rng.integers(0, B))
            mode = int(rng.integers(0, 3))
            m = bytearray(mutated[bi])
            if mode == 0:  # bit flip
                m[int(rng.integers(0, len(m)))] ^= 1 << int(
                    rng.integers(0, 8))
            elif mode == 1:  # truncate
                m = m[: int(rng.integers(0, len(m)))]
            else:  # garbage payload
                for k in range(min(16, len(m))):
                    m[len(m) - 1 - k] = int(rng.integers(0, 256))
            mutated[bi] = bytes(m)
            host = _host_outcome(mutated, n)
            try:
                got = BatchDecompressor(params, B, n).decompress_frames(
                    mutated)
                dev = ("ok", got)
            except CmpError:
                dev = ("err", None)
            if host[0] == "chain":
                continue  # see _host_outcome
            if host[0] == "ok" and dev[0] == "ok":
                if not np.array_equal(dev[1], host[1]):
                    mismatches += 1
                    print(f"MISMATCH samples case {cases}", file=sys.stderr)
            elif host[0] == "err" and dev[0] == "ok":
                mismatches += 1
                print(f"MISMATCH host-rejects case {cases}",
                      file=sys.stderr)
            # device stricter than host is allowed (batch API contract)
    print(json.dumps({"metric": "fuzz_soak", "seconds": round(
        time.time() - t0, 1), "cases": cases, "mutations": mutations,
        "mismatches": mismatches}))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
