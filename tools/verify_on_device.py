"""On-hardware bit-exactness check: device encoder vs the host codec.

The unit suite runs on CPU (tests/conftest.py pins the platform), so this
tool is the real-hardware counterpart: it runs the fused device encoder on
the actual TPU across representative configs — smooth AIRS-like rows,
uniform-random rows, and i16 boundary values — and asserts every produced
frame is byte-identical to the host codec (which is itself differential-
tested against the unmodified reference C library, tests/test_oracle_parity.py).

Run from the repo root:  python tools/verify_on_device.py
Exit code 0 = all frames byte-identical.
"""

import os
import pathlib
import sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AIRS_BENCH_CACHE", str(_REPO / ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from airs_compression_tpu.engine.context import CmpContext, set_timestamp_func
from airs_compression_tpu.format.params import CmpParams, EncoderType, Preprocessing
from airs_compression_tpu.ops.encode import (
    _encode_one_pass,
    make_pass_config,
    worst_case_words,
)
from airs_compression_tpu.utils.xxh32 import cmp_checksum

CONFIGS = [
    (Preprocessing.DIFF, EncoderType.GOLOMB_ZERO, 4, 0, False),
    (Preprocessing.DIFF, EncoderType.GOLOMB_ZERO, 4, 0, True),
    (Preprocessing.NONE, EncoderType.GOLOMB_MULTI, 8, 100, True),
    (Preprocessing.IWT, EncoderType.GOLOMB_ZERO, 2, 0, False),
    (Preprocessing.NONE, EncoderType.UNCOMPRESSED, 0, 0, True),
]


def run_config(conf, B: int = 256, N: int = 512) -> int:
    """Encode B blocks on the device under one config; return mismatch count."""
    prep, enc, par, out_p, csum = conf
    rng = np.random.default_rng(7)
    params = CmpParams(
        primary_preprocessing=prep, primary_encoder_type=enc,
        primary_encoder_param=par, primary_encoder_outlier=out_p,
        checksum_enabled=csum, uncompressed_fallback_enabled=False)
    cfg = make_pass_config(params, False, True)
    nw = worst_case_words(cfg, N)
    frames = ((1100 + rng.normal(0, 6, (B, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    frames[: B // 4] = rng.integers(0, 1 << 16, (B // 4, N)).astype(np.uint16)
    frames[-1, :8] = [0, 0xFFFF, 0x8000, 0x7FFF, 1, 0xFFFE, 0x8001, 0x7FFE]
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    zb = jnp.zeros((B,), jnp.int32)
    zu = jnp.zeros((B,), jnp.uint32)
    cs = (jnp.asarray([cmp_checksum(f) for f in frames], jnp.uint32)
          if csum else zu)
    words, sizes = jax.jit(lambda x, cs: _encode_one_pass(
        cfg, x, x, zb, zu, zu, cs, nw))(x, cs)
    words, sizes = np.asarray(words), np.asarray(sizes)

    set_timestamp_func(lambda: (0, 0))  # identifier 0, like the device call
    try:
        bad = 0
        for i in range(B):
            ctx = CmpContext(params)
            ref = ctx.compress_u16(frames[i])
            dev = words[i].astype(">u4").tobytes()[: int(sizes[i])]
            if dev != ref:
                bad += 1
                print(f"MISMATCH {prep.name}/{enc.name} block {i}: "
                      f"device {len(dev)} B vs host {len(ref)} B",
                      file=sys.stderr)
                if bad >= 3:
                    break
    finally:
        set_timestamp_func(None)
    status = "byte-identical" if not bad else f"{bad} MISMATCHES"
    print(f"{prep.name:5s}/{enc.name:12s} csum={int(csum)}: "
          f"{B} blocks {status}", file=sys.stderr)
    return bad


# Stream-shaped hardware checks: the full batched wrapper (fallback,
# model chains, adaptive per-block parameters) encode -> device decode
# round-trip, with the encode side byte-checked against per-block host
# contexts (identifier bytes masked: draw order differs by construction).
CHAIN_CONFIGS = ["fallback", "adaptive", "model-chain"]


def run_chain_config(name: str, B: int = 64, N: int = 512) -> int:
    from airs_compression_tpu.models.stream import (
        BatchCompressor,
        BatchDecompressor,
    )

    rng = np.random.default_rng(11)
    if name == "fallback":
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=1,
                           uncompressed_fallback_enabled=True)
    elif name == "adaptive":
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4)
    else:  # model-chain
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4,
                           secondary_iterations=5,
                           secondary_preprocessing=Preprocessing.MODEL,
                           secondary_encoder_type=EncoderType.GOLOMB_MULTI,
                           secondary_encoder_param=2,
                           secondary_encoder_outlier=40, model_rate=8)
    bc = BatchCompressor(params, B, N, adaptive=(name == "adaptive"))
    bd = BatchDecompressor(params, B, N)
    base = (1100 + rng.normal(0, 4, (B, N))).astype(np.int64)
    bad = 0
    ctxs = None
    for step in range(3):
        sigma = [2, 30, 5][step]
        frames = ((base + rng.normal(0, sigma, (B, N))).astype(np.int64)
                  & 0xFFFF).astype(np.uint16)
        if name == "fallback":
            frames[: B // 2] = rng.integers(0, 1 << 16, (B // 2, N))
        outs = bc.compress_frames(frames)
        dec = bd.decompress_frames(outs)
        if not np.array_equal(dec, frames):
            bad += 1
        if name == "model-chain":
            # encode-side parity vs per-block host contexts
            set_timestamp_func(lambda: (0, 0))
            try:
                if ctxs is None:
                    ctxs = {b: CmpContext(params)
                            for b in range(0, B, 16)}
                for b in range(0, B, 16):
                    ref = bytearray(ctxs[b].compress_u16(frames[b]))
                    dev = bytearray(outs[b])
                    ref[8:14] = dev[8:14] = b"\0" * 6
                    if ref != dev:
                        bad += 1
            finally:
                set_timestamp_func(None)
    status = "round-trips" if not bad else f"{bad} FAILURES"
    print(f"chain:{name:12s}: {B} blocks x 3 frames {status}",
          file=sys.stderr)
    return bad


def main(B: int = 256, N: int = 512) -> int:
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    fails = sum(run_config(conf, B, N) for conf in CONFIGS)
    fails += sum(run_chain_config(n, max(B // 4, 16), N)
                 for n in CHAIN_CONFIGS)
    print(f"verify_on_device: {fails} failures", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
