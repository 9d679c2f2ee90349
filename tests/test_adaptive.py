"""Adaptive per-block Golomb parameter selection (ops/adapt.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from airs_compression_tpu import (
    CmpContext,
    CmpHeader,
    CmpParams,
    EncoderType,
    Preprocessing,
    decompress,
)
from airs_compression_tpu.models.stream import BatchCompressor
from airs_compression_tpu.ops import adapt
from airs_compression_tpu.utils.bits import (
    derive_encoder_outlier,
)


def _frames(rng, B, N, sigmas):
    out = np.empty((B, N), np.uint16)
    for b in range(B):
        f = (20000 + rng.normal(0, sigmas[b % len(sigmas)], N)).astype(np.int64)
        out[b] = (f & 0xFFFF).astype(np.uint16)
    return out


class TestSelection:
    def test_cost_model_matches_encoder(self):
        """code_lengths_for must equal the true coded length."""
        from airs_compression_tpu.engine import host

        rng = np.random.default_rng(0)
        residuals = rng.integers(-200, 201, 500).astype(np.int16)
        for g in (1, 4, 10, 64, 0xFFFF):
            outlier = derive_encoder_outlier(1, g, 0)
            _, lens = host.encode_codewords(residuals, 1, g, outlier)
            mapped = jnp.asarray(host.zigzag_map(residuals).astype(np.uint32))
            got = int(adapt.code_lengths_for(mapped, g))
            assert got == int(lens.sum()), f"g={g}"

    def test_argmin_beats_fixed(self):
        rng = np.random.default_rng(1)
        res = jnp.asarray(rng.integers(-50, 51, (4, 1024)).astype(np.int32))
        g_sel, best_bits = adapt.select_golomb_zero(res)
        mapped = adapt.golomb.zigzag(res)
        for g in adapt.DEFAULT_LADDER:
            costs = adapt.code_lengths_for(mapped, g)
            assert (np.asarray(best_bits) <= np.asarray(costs)).all()

    def test_dynamic_codewords_match_static(self):
        """Per-block dynamic codegen == static codegen at the same g."""
        from airs_compression_tpu.ops import golomb as g_ops

        rng = np.random.default_rng(2)
        res = jnp.asarray(rng.integers(-3000, 3000, (3, 256)).astype(np.int32))
        for g in (1, 5, 32, 700):
            g_arr = jnp.full((3,), g, jnp.int32)
            hi_d, lo_d, ln_d = adapt.encode_codewords_dynamic(res, g_arr)
            outlier = derive_encoder_outlier(1, g, 0)
            hi_s, lo_s, ln_s = g_ops.encode_codewords(res, 1, g, outlier)
            np.testing.assert_array_equal(np.asarray(lo_d), np.asarray(lo_s))
            np.testing.assert_array_equal(np.asarray(ln_d), np.asarray(ln_s))


class TestAdaptivePipeline:
    def test_adaptive_stream_decodes(self):
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4)
        B, N = 4, 512
        rng = np.random.default_rng(3)
        bc = BatchCompressor(params, B, N, adaptive=True)
        frames = _frames(rng, B, N, sigmas=[1, 8, 60, 2000])
        outs = bc.compress_frames(frames)
        gs = []
        for b, f in enumerate(outs):
            hdr, _ = CmpHeader.deserialize(f)
            gs.append(hdr.encoder_param)
            assert hdr.encoder_outlier == derive_encoder_outlier(
                1, hdr.encoder_param, 0)
            dec, _ = decompress(f)
            np.testing.assert_array_equal(dec, frames[b])
        # different noise scales should select different parameters
        assert len(set(gs)) >= 3, gs

    def test_adaptive_not_worse_than_fixed(self):
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4)
        B, N = 4, 512
        rng = np.random.default_rng(4)
        frames = _frames(rng, B, N, sigmas=[1, 8, 60, 2000])
        bc = BatchCompressor(params, B, N, adaptive=True)
        adaptive_total = sum(map(len, bc.compress_frames(frames)))
        for g in (1, 4, 64):
            p = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                          primary_encoder_type=EncoderType.GOLOMB_ZERO,
                          primary_encoder_param=g)
            fixed = BatchCompressor(p, B, N)
            fixed_total = sum(map(len, fixed.compress_frames(frames)))
            assert adaptive_total <= fixed_total, f"worse than fixed g={g}"

    def test_adaptive_chain_with_model(self):
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4,
                           secondary_iterations=3,
                           secondary_preprocessing=Preprocessing.MODEL,
                           secondary_encoder_type=EncoderType.GOLOMB_ZERO,
                           secondary_encoder_param=4, model_rate=8)
        B, N = 2, 256
        rng = np.random.default_rng(5)
        bc = BatchCompressor(params, B, N, adaptive=True)
        chains = [b"" for _ in range(B)]
        origs = [[] for _ in range(B)]
        for _ in range(4):
            frames = _frames(rng, B, N, sigmas=[4, 30])
            outs = bc.compress_frames(frames)
            for b in range(B):
                chains[b] += outs[b]
                origs[b].append(frames[b])
        for b in range(B):
            dec, hdrs = decompress(chains[b])
            np.testing.assert_array_equal(dec, np.concatenate(origs[b]))
            assert [h.sequence_number for h in hdrs] == [0, 1, 2, 3]
