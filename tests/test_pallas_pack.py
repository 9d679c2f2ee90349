"""Pallas packer parity vs the XLA tree packer (interpreter mode on CPU).

The Pallas kernels (ops/pallas_pack.py) are the TPU fast path for
variable-length bit packing; on hardware they are exercised end-to-end by
the engine.  Here they run under ``interpret=True`` on the CPU test
platform and must reproduce ``bitpack.pack_codes_tree`` bit-for-bit —
which is itself pinned to the reference bitstream format
(lib/common/bitstream_writer.h) by the oracle parity tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from airs_compression_tpu.ops import bitpack, golomb
from airs_compression_tpu.ops.pallas_pack import (
    pack_codes_tree_pallas,
    pack_residuals_pallas,
    pallas_pack_supported,
)

B = 128  # minimum lane tile


def _assert_same(ref, pal):
    w_ref, tb_ref = map(np.asarray, ref)
    w_pal, tb_pal = map(np.asarray, pal)
    np.testing.assert_array_equal(tb_ref, tb_pal)
    c = min(w_ref.shape[1], w_pal.shape[1])
    np.testing.assert_array_equal(w_ref[:, :c], w_pal[:, :c])
    assert not w_ref[:, c:].any() and not w_pal[:, c:].any()


@pytest.mark.parametrize("K,W", [(16, 19), (64, 7), (256, 32), (128, 48)])
def test_random_codes_match_xla_tree(K, W):
    rng = np.random.default_rng(K * 100 + W)
    ln = rng.integers(0, W + 1, (B, K)).astype(np.int32)
    val = rng.integers(0, 1 << 62, (B, K), dtype=np.uint64) \
        & ((np.uint64(1) << ln.astype(np.uint64)) - np.uint64(1))
    lo = jnp.asarray((val & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((val >> np.uint64(32)).astype(np.uint32))
    lnj = jnp.asarray(ln)
    _assert_same(bitpack.pack_codes_tree(hi, lo, lnj, W),
                 pack_codes_tree_pallas(hi, lo, lnj, W, interpret=True))


@pytest.mark.parametrize("enc_type,g_par,outlier,W", [
    (1, 4, 67, 19),    # GOLOMB_ZERO, derived optimal outlier
    (1, 1, 16, 17),    # g=1 edge
    (2, 2, 40, 48),    # GOLOMB_MULTI with escapes
    (0, 0, 0, 16),     # UNCOMPRESSED
])
def test_fused_residual_kernel(enc_type, g_par, outlier, W):
    rng = np.random.default_rng(enc_type * 7 + g_par)
    K = 128
    res = jnp.asarray(rng.integers(-32768, 32768, (B, K)), jnp.int32)
    hi, lo, ln = golomb.encode_codewords(res, enc_type, g_par, outlier)
    _assert_same(
        bitpack.pack_codes_tree(hi, lo, ln, W),
        pack_residuals_pallas(res, enc_type, g_par, outlier, W,
                              interpret=True))


def test_zero_length_padding_codes():
    # K padded beyond the real code count with len-0 codes
    rng = np.random.default_rng(3)
    K, W = 64, 19
    ln = rng.integers(1, W + 1, (B, K)).astype(np.int32)
    ln[:, 40:] = 0
    lo = jnp.asarray(
        rng.integers(0, 1 << 19, (B, K)).astype(np.uint32)
        & ((np.uint32(1) << ln.astype(np.uint32)) - np.uint32(1)))
    hi = jnp.zeros((B, K), jnp.uint32)
    lnj = jnp.asarray(ln)
    _assert_same(bitpack.pack_codes_tree(hi, lo, lnj, W),
                 pack_codes_tree_pallas(hi, lo, lnj, W, interpret=True))


class TestEntropyClamp:
    """cap_bits clamped packing: parity when it fits, flags when not."""

    def _codes(self, sigma, seed=0, K=1024):
        rng = np.random.default_rng(seed)
        res = jnp.asarray(
            np.clip(rng.normal(0, sigma, (B, K)), -32768, 32767)
            .astype(np.int32))
        return golomb.encode_codewords(res, 1, 4, 67), res

    def test_clamped_parity_and_ok(self):
        (hi, lo, ln), res = self._codes(sigma=8.5)
        W = 19
        ref_w, ref_b = map(np.asarray, bitpack.pack_codes_tree(hi, lo, ln, W))
        w, b, ok = pack_codes_tree_pallas(hi, lo, ln, W, cap_bits=10,
                                          interpret=True)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(ref_b, np.asarray(b))
        c = min(ref_w.shape[1], w.shape[1])
        np.testing.assert_array_equal(ref_w[:, :c], np.asarray(w)[:, :c])
        # fused variant
        w2, b2, ok2 = pack_residuals_pallas(res, 1, 4, 67, W, cap_bits=10,
                                            interpret=True)
        assert np.asarray(ok2).all()
        np.testing.assert_array_equal(ref_w[:, :c], np.asarray(w2)[:, :c])

    def test_overflow_flagged_not_silent(self):
        (hi, lo, ln), _ = self._codes(sigma=8.5, seed=1)
        rng = np.random.default_rng(2)
        # rows 0-7: incompressible lengths -> must be flagged
        ln_np = np.asarray(ln).copy()
        ln_np[:8] = rng.integers(15, 20, ln_np[:8].shape)
        lnj = jnp.asarray(ln_np)
        W = 19
        w, b, ok = pack_codes_tree_pallas(hi, lo, lnj, W, cap_bits=10,
                                          interpret=True)
        ok = np.asarray(ok)
        assert not ok[:8].any()
        assert ok[8:].all()
        # total bits stay exact even for flagged rows
        np.testing.assert_array_equal(np.asarray(b), ln_np.sum(axis=1))
        # unflagged rows remain bit-exact
        ref_w, _ = map(np.asarray,
                       bitpack.pack_codes_tree(hi, lo, lnj, W))
        c = min(ref_w.shape[1], w.shape[1])
        np.testing.assert_array_equal(ref_w[8:, :c], np.asarray(w)[8:, :c])


    def test_clamped_output_width_bounds_stream(self):
        # the clamped kernel's (narrow) output width is a true capacity:
        # every ok row's full stream fits inside it, and the frame-level
        # capacity helper covers header + payload + checksum on top
        from airs_compression_tpu.format.params import CmpParams, EncoderType, Preprocessing
        from airs_compression_tpu.ops.encode import (
            clamped_frame_words,
            make_pass_config,
            worst_case_words,
        )

        (hi, lo, ln), res = self._codes(sigma=8.5, seed=4)
        W, cap = 19, 10
        w, b, ok = pack_codes_tree_pallas(hi, lo, ln, W, cap_bits=cap,
                                          interpret=True)
        assert np.asarray(ok).all()
        assert w.shape[1] < bitpack.pack_codes_tree(hi, lo, ln, W)[0].shape[1]
        assert int(np.asarray(b).max()) <= w.shape[1] * 32

        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=4)
        cfg = make_pass_config(params, False, True)
        n = 1024
        fw = clamped_frame_words(cfg, n, cap)
        assert fw < worst_case_words(cfg, n)
        # header + payload + byte pad + checksum all fit
        assert fw * 32 >= cfg.hdr_bits + w.shape[1] * 32 + 7 + 32
        assert clamped_frame_words(cfg, n, None) == worst_case_words(cfg, n)


def test_supported_predicate():
    assert pallas_pack_supported(128, 8192, 19)
    assert pallas_pack_supported(512, 16, 48)
    assert not pallas_pack_supported(100, 8192, 19)   # B not lane-aligned
    assert not pallas_pack_supported(128, 8192, 65)   # code too wide
    assert not pallas_pack_supported(128, 24, 19)     # K/8 not a pow2
    assert not pallas_pack_supported(128, 8, 19)      # K too small


def test_merge_streams_tree_matches_single_pack():
    """Row-split pack + merge == one-shot pack (the SP fast path)."""
    from airs_compression_tpu.ops.bitpack import (
        merge_streams_tree,
        pack_codes_tree,
    )

    rng = np.random.default_rng(12)
    K, R, W = 2048, 128, 19
    ln = rng.integers(1, 9, (K,)).astype(np.int32)
    lo = rng.integers(0, 1 << 16, (K,)).astype(np.uint32)
    lo &= ((1 << ln) - 1).astype(np.uint32)  # clean codes
    hi = np.zeros((K,), np.uint32)
    hj, lj, lnj = map(jnp.asarray, (hi, lo, ln))

    ref_w, ref_b = map(np.asarray, pack_codes_tree(hj, lj, lnj, W))
    rows = lambda v: v.reshape(R, K // R)
    w_rows, b_rows = pack_codes_tree_pallas(
        rows(hj), rows(lj), rows(lnj), W, interpret=True)
    got_w, got_b = map(np.asarray, merge_streams_tree(w_rows, b_rows))
    assert int(got_b) == int(ref_b)
    nw = (int(ref_b) + 31) // 32
    np.testing.assert_array_equal(ref_w[:nw], got_w[:nw])


class TestNarrowMultiPath:
    """GOLOMB_MULTI narrow packing: tree sized for <= 32-bit codes.

    MULTI's 48-bit worst case is an escape class real data rarely hits;
    the narrow instantiation runs the one-word level-0 tree (the same
    cost class as GOLOMB_ZERO) and flags any lane containing a wider
    code through ``ok`` so the caller re-encodes it at full capacity.
    """

    def _codes(self, g, outlier, extreme):
        rng = np.random.default_rng(42)
        B, K = 128, 64
        res = rng.normal(0, 0.8, (B, K)).astype(np.int64).astype(np.int16)
        if extreme:
            res[::5, 7] = -32768  # escape with a long unary prefix
        from airs_compression_tpu.ops import golomb

        res_j = jnp.asarray(res.astype(np.int32))
        return golomb.encode_codewords(res_j, 2, g, outlier)

    def _check(self, hi, lo, ln, cap):
        from airs_compression_tpu.ops.bitpack import pack_codes_tree

        ln_np = np.asarray(ln)
        wide = (ln_np > 32).any(axis=1)
        ref_w, ref_b = map(np.asarray, pack_codes_tree(hi, lo, ln, 48))
        w, b, ok = map(np.asarray, pack_codes_tree_pallas(
            hi, lo, ln, 48, cap_bits=cap, interpret=True, narrow=True))
        np.testing.assert_array_equal(b, ref_b)  # sizes exact always
        assert not (ok & wide).any(), "wide lanes must be flagged"
        for i in np.nonzero(ok)[0]:
            nw = (int(ref_b[i]) + 31) // 32
            np.testing.assert_array_equal(w[i, :nw], ref_w[i, :nw])
        return ok, wide

    def test_all_narrow_codes_pack_exactly(self):
        hi, lo, ln = self._codes(4, 30, extreme=False)
        ok, wide = self._check(hi, lo, ln, cap=9)
        assert wide.sum() == 0 and ok.sum() > 0

    def test_wide_codes_are_flagged(self):
        hi, lo, ln = self._codes(1, 30, extreme=True)
        ok, wide = self._check(hi, lo, ln, cap=9)
        assert wide.sum() > 0
        assert (~ok[wide]).all()
