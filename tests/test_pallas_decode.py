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


@pytest.mark.parametrize("enc", [EncoderType.GOLOMB_ZERO,
                                 EncoderType.GOLOMB_MULTI])
def test_dynamic_per_lane_params_match_xla(enc):
    """Header-driven decode: per-lane g/outlier (adaptive streams)."""
    from airs_compression_tpu.ops.encode import (
        adaptive_worst_case_words,
        encode_blocks_adaptive,
    )

    params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                       primary_encoder_type=enc,
                       primary_encoder_param=4,
                       primary_encoder_outlier=(
                           40 if enc == EncoderType.GOLOMB_MULTI else 16))
    cfg = make_pass_config(params, False, True)
    rng = np.random.default_rng(11)
    frames = np.empty((B, N), np.uint16)
    for i in range(B):  # widening noise across the batch -> g varies
        frames[i] = (1000 + rng.normal(0, 1 + (i % 12), N)).astype(
            np.int64) & 0xFFFF
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    from airs_compression_tpu.ops.adapt import DEFAULT_LADDER

    nw = adaptive_worst_case_words(cfg, N, DEFAULT_LADDER)
    z = jnp.zeros((B,), jnp.int32)
    zu = jnp.zeros((B,), jnp.uint32)
    words, sizes, _fb, g_sel, _ok = encode_blocks_adaptive(
        cfg, None, x, x, z, zu, zu, zu, nw, DEFAULT_LADDER)
    # per-lane params as the headers carry them
    from airs_compression_tpu.format.header import CmpHeader

    w_np = np.asarray(words)
    hdr0 = CmpHeader.deserialize(w_np[0].astype(">u4").tobytes())[0]
    g_np = np.empty((B,), np.uint32)
    o_np = np.empty((B,), np.uint32)
    for i in range(B):
        h = CmpHeader.deserialize(w_np[i].astype(">u4").tobytes())[0]
        g_np[i], o_np[i] = h.encoder_param, h.encoder_outlier
    assert len(set(g_np.tolist())) > 1
    np.testing.assert_array_equal(g_np, np.asarray(g_sel).astype(np.uint32))
    # decode cfg: g_par upper-bounds every lane (sizes the code width)
    from airs_compression_tpu.ops.encode import PassConfig

    g_cap = 1 << (int(g_np.max()) - 1).bit_length()
    dcfg = PassConfig(int(hdr0.preprocessing), int(enc), g_cap, 0,
                      False, 0, False, True)
    g_dyn = jnp.asarray(g_np)
    o_dyn = jnp.asarray(o_np)
    s_ref, e_ref = decode_blocks_device(dcfg, words, x, N,
                                        g_dyn=g_dyn, outlier_dyn=o_dyn)
    s_pal, e_pal = decode_blocks_pallas(dcfg, words, x, N, interpret=True,
                                        g_dyn=g_dyn, outlier_dyn=o_dyn)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pal))
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_pal))
    np.testing.assert_array_equal(np.asarray(s_pal), np.asarray(x))


def test_half_tile_instantiation_matches_full():
    """sub=4 (512 blocks/tile) decodes bit-identically to sub=8.

    The half tile exists for small batches; whether it is FASTER is a
    hardware question (BASELINE.md: it is not — Mosaic pads 4-sublane
    vregs), but it must always be exact.
    """
    params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                       primary_encoder_type=EncoderType.GOLOMB_ZERO,
                       primary_encoder_param=4)
    cfg = make_pass_config(params, False, True)
    Bh = 512
    rng = np.random.default_rng(31)
    frames = ((1100 + rng.normal(0, 5, (Bh, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    n_words = worst_case_words(cfg, N)
    zb = jnp.zeros((Bh,), jnp.uint32)
    words, sizes = _encode_one_pass(cfg, x, x, zb.astype(jnp.int32), zb,
                                    zb, zb, n_words)
    model = jnp.zeros((Bh, N), jnp.int32)
    s8, e8 = decode_blocks_pallas(cfg, words, model, N, interpret=True,
                                  sub=8)
    s4, e4 = decode_blocks_pallas(cfg, words, model, N, interpret=True,
                                  sub=4)
    np.testing.assert_array_equal(np.asarray(s4), np.asarray(s8))
    np.testing.assert_array_equal(np.asarray(e4), np.asarray(e8))
    np.testing.assert_array_equal(
        np.asarray(s8).astype(np.int32).astype(np.uint16), frames)
