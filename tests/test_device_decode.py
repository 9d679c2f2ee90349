"""Device decoder parity: decode_blocks_device vs host codec round-trips."""

import numpy as np
import pytest

from airs_compression_tpu import (
    CmpContext,
    CmpParams,
    EncoderType,
    Preprocessing,
)
from airs_compression_tpu.format.dtypes import CmpType
from airs_compression_tpu.models.stream import BatchCompressor, BatchDecompressor

CONFIGS = [
    CmpParams(),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=1),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=7),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=5, primary_encoder_outlier=80),
    CmpParams(primary_preprocessing=Preprocessing.NONE,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=0xFFFF,
              primary_encoder_outlier=0xFFFFFFFF),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=2,
              secondary_iterations=4,
              secondary_preprocessing=Preprocessing.MODEL,
              secondary_encoder_type=EncoderType.GOLOMB_MULTI,
              secondary_encoder_param=3, secondary_encoder_outlier=60,
              model_rate=10),
]


@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
@pytest.mark.parametrize("n,kind", [(64, "smooth"), (333, "noise")])
def test_device_roundtrip(cfg_i, n, kind):
    params = CONFIGS[cfg_i]
    B = 3
    rng = np.random.default_rng(17 * cfg_i + n)
    bc = BatchCompressor(params, B, n)
    bd = BatchDecompressor(params, B, n)
    n_frames = 3 if params.secondary_iterations else 2
    for fi in range(n_frames):
        if kind == "noise":
            frames = rng.integers(0, 65536, (B, n)).astype(np.uint16)
        else:
            frames = ((1100 + rng.normal(0, 6, (B, n))).astype(np.int64)
                      & 0xFFFF).astype(np.uint16)
        outs = bc.compress_frames(frames)
        dec = bd.decompress_frames(outs)
        np.testing.assert_array_equal(
            dec, frames, err_msg=f"cfg {cfg_i} frame {fi} ({kind}, n={n})")


def test_device_decode_matches_host_decoder():
    """Device decode of a host-encoded stream."""
    params = CONFIGS[2]
    n = 256
    rng = np.random.default_rng(5)
    data = ((1000 + rng.normal(0, 10, n)).astype(np.int64) & 0xFFFF
            ).astype(np.uint16)
    frame = CmpContext(params).compress_u16(data)
    bd = BatchDecompressor(params, 1, n)
    dec = bd.decompress_frames([frame])
    np.testing.assert_array_equal(dec[0], data)


def test_mixed_seq_batch_decodes_and_advances_models():
    """A batch mixing primary and secondary frames (the state after a
    fallback reset one chain) decodes correctly and keeps per-block model
    state consistent for subsequent secondary frames."""
    params = CmpParams(
        primary_preprocessing=Preprocessing.DIFF,
        primary_encoder_type=EncoderType.GOLOMB_ZERO,
        primary_encoder_param=2,
        secondary_iterations=4,
        secondary_preprocessing=Preprocessing.MODEL,
        secondary_encoder_type=EncoderType.GOLOMB_ZERO,
        secondary_encoder_param=3, model_rate=9)
    rng = np.random.default_rng(99)
    n = 96

    def frame():
        return ((1100 + rng.normal(0, 6, n)).astype(np.int64)
                & 0xFFFF).astype(np.uint16)

    ctx_a = CmpContext(params)
    a1, a2, a3 = frame(), frame(), frame()
    fa1, fa2, fa3 = (ctx_a.compress_u16(f) for f in (a1, a2, a3))

    ctx_b = CmpContext(params)
    b1 = frame()
    fb1 = ctx_b.compress_u16(b1)
    # chain b restarts (e.g. after a fallback reset): fresh context
    ctx_b2 = CmpContext(params)
    b2, b3 = frame(), frame()
    fb2, fb3 = (ctx_b2.compress_u16(f) for f in (b2, b3))

    bd = BatchDecompressor(params, 2, n)
    np.testing.assert_array_equal(bd.decompress_frames([fa1, fb1]),
                                  np.stack([a1, b1]))
    # mixed: chain a on seq 1 (secondary), chain b back on seq 0 (primary)
    np.testing.assert_array_equal(bd.decompress_frames([fa2, fb2]),
                                  np.stack([a2, b2]))
    # both secondary again; models must have advanced per block
    np.testing.assert_array_equal(bd.decompress_frames([fa3, fb3]),
                                  np.stack([a3, b3]))
