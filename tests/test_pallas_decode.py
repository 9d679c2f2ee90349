"""Pallas slab-pyramid decoder parity (interpreter mode on CPU).

The Pallas decoder (ops/pallas_decode.py) must reproduce the XLA scan
decoder (ops/decode.py) bit-for-bit — samples and end bit positions — and
round-trip frames produced by the device encoder.  On hardware it is the
default path for batches >= 1024 blocks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from airs_compression_tpu.format.params import (
    CmpParams,
    EncoderType,
    Preprocessing,
)
from airs_compression_tpu.ops.decode import decode_blocks_device
from airs_compression_tpu.ops.encode import (
    _encode_one_pass,
    make_pass_config,
    worst_case_words,
)
from airs_compression_tpu.ops.pallas_decode import decode_blocks_pallas

B, N = 1024, 64  # minimum tile; small N keeps interpreter mode fast


CONFIGS = [
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=4),
    CmpParams(primary_preprocessing=Preprocessing.NONE,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=2, primary_encoder_outlier=40),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=1),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.UNCOMPRESSED),
]


@pytest.mark.parametrize("params", CONFIGS)
def test_matches_xla_decoder_and_roundtrips(params):
    rng = np.random.default_rng(hash(params.primary_encoder_type) % 1000)
    cfg = make_pass_config(params, False, True)
    frames = ((1100 + rng.normal(0, 200, (B, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    nw = worst_case_words(cfg, N)
    z = jnp.zeros((B,), jnp.int32)
    zu = jnp.zeros((B,), jnp.uint32)
    words, _ = _encode_one_pass(cfg, x, x, z, zu, zu, zu, nw)

    s_ref, e_ref = decode_blocks_device(cfg, words, x, N)
    s_pal, e_pal = decode_blocks_pallas(cfg, words, x, N, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pal))
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_pal))
    np.testing.assert_array_equal(np.asarray(s_pal), np.asarray(x))


def test_non_tile_batch_is_padded_internally():
    """Any B >= 1 is accepted; padding rows must not disturb real rows."""
    Bs = 100  # not a multiple of the 1024-block tile
    params = CONFIGS[0]
    rng = np.random.default_rng(5)
    cfg = make_pass_config(params, False, True)
    frames = ((1100 + rng.normal(0, 50, (Bs, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    nw = worst_case_words(cfg, N)
    z = jnp.zeros((Bs,), jnp.int32)
    zu = jnp.zeros((Bs,), jnp.uint32)
    words, _ = _encode_one_pass(cfg, x, x, z, zu, zu, zu, nw)

    s_ref, e_ref = decode_blocks_device(cfg, words, x, N)
    s_pal, e_pal = decode_blocks_pallas(cfg, words, x, N, interpret=True)
    assert s_pal.shape == (Bs, N) and e_pal.shape == (Bs,)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pal))
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_pal))
    np.testing.assert_array_equal(np.asarray(s_pal), np.asarray(x))
