"""Variable-length bit packing via prefix sums — the core TPU kernel.

The reference packs codewords through a sequential 64-bit cache
(lib/common/bitstream_writer.h:124-158).  That formulation is inherently
serial, so this module re-derives bit packing as a data-parallel problem:

1. An exclusive prefix sum of the per-code bit lengths yields every code's
   absolute bit offset in the stream.
2. A code of <= 48 bits starting at bit offset ``o`` touches at most three
   consecutive 32-bit output words (``o>>5`` .. ``o>>5``+2).  Funnel shifts
   produce each code's three word-aligned contributions.
3. Contributions from different codes to the same word occupy disjoint bit
   ranges, so integer ADD equals bitwise OR — and because uint32 addition
   is associative mod 2^32, *differences of prefix sums* of the
   contributions recover each word's total exactly.  One prefix sum per
   contribution slot plus a ``searchsorted`` over the (sorted) first-word
   indices therefore assembles the entire packed stream with no scatter
   and no sequential dependency.

Everything is uint32 (TPU-native); no 64-bit emulation is needed.  The
stream is produced MSB-first in big-endian word order, exactly matching
the reference bitstream format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_codes", "exclusive_cumsum"]

_U32 = jnp.uint32


def exclusive_cumsum(x: jax.Array) -> jax.Array:
    """Exclusive cumulative sum along the last axis."""
    c = jnp.cumsum(x, axis=-1)
    return jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)


def _funnel_u32(hi: jax.Array, lo: jax.Array, s: jax.Array) -> jax.Array:
    """uint32 of ((hi:lo) >> s) for s in [-95, 95]; negative s shifts left.

    ``hi:lo`` is a conceptual 64-bit value (hi = bits 32..63).  Shift
    amounts are clamped before use so no lane performs an out-of-range
    hardware shift.
    """
    s32 = s.astype(jnp.int32)
    # right shift path: (lo >> s) | (hi << (32-s)) for 0<=s<32, hi>>(s-32)
    # for 32<=s<64, 0 beyond
    sr = jnp.clip(s32, 0, 31).astype(_U32)
    srh = jnp.clip(s32 - 32, 0, 31).astype(_U32)
    # hi << (32-sr) with sr==0 lanes masked (shift amount clamped to 31)
    hi_shift = jnp.clip(32 - s32, 0, 31).astype(_U32)
    right_lo = (lo >> sr) | jnp.where(sr == 0, _U32(0), hi << hi_shift)
    right_hi = hi >> srh
    right = jnp.where(s32 < 32, right_lo, right_hi)
    right = jnp.where(s32 >= 64, _U32(0), right)
    # left shift path: lo << t for 0<t<32, 0 beyond (hi bits exceed u32)
    t = jnp.clip(-s32, 0, 31).astype(_U32)
    left = jnp.where(-s32 < 32, lo << t, _U32(0))
    return jnp.where(s32 >= 0, right, left)


def pack_codes(hi: jax.Array, lo: jax.Array, lens: jax.Array, n_words: int):
    """Pack variable-length codes into a big-endian 32-bit word stream.

    Args:
      hi, lo: uint32 (..., K) codeword bits (hi = bits above 32; MSB-first
        codes of length <= 48, "clean": bits above ``lens`` are zero).
      lens: int32 (..., K) per-code bit lengths (>= 0; zero-length codes
        contribute nothing).
      n_words: static output capacity in 32-bit words.

    Returns:
      (words: uint32 (..., n_words) big-endian bit stream,
       total_bits: int32 (...,) actual stream length in bits).
    """
    off = exclusive_cumsum(lens)
    total_bits = off[..., -1] + lens[..., -1]
    w0 = (off >> 5).astype(jnp.int32)
    r = (off & 31).astype(jnp.int32)

    # Three word-aligned contributions per code (word w0+k, k in 0..2).
    base = lens + r
    contrib = [_funnel_u32(hi, lo, base - 32 * (k + 1)) for k in range(3)]
    # zero-length codes must contribute nothing
    nz = lens > 0
    contrib = [jnp.where(nz, c, _U32(0)) for c in contrib]

    # Inclusive-from-zero prefix sums: P[..., i] = sum(contrib[..., :i]).
    def _psum(c):
        s = jnp.cumsum(c, axis=-1)
        return jnp.concatenate([jnp.zeros_like(s[..., :1]), s], axis=-1)

    pa, pb, pc = (_psum(c) for c in contrib)

    # For each output word w: codes with w0 == w contribute slot a,
    # w0 == w-1 slot b, w0 == w-2 slot c.  w0 is sorted, so the index
    # ranges come from searchsorted, and prefix-sum differences (exact mod
    # 2^32; disjoint bit ranges never carry) assemble the word.
    words_idx = jnp.arange(n_words, dtype=jnp.int32)

    def _one_block(w0_b, pa_b, pb_b, pc_b):
        edges = jnp.searchsorted(w0_b, words_idx, side="left").astype(jnp.int32)
        edges_r = jnp.searchsorted(w0_b, words_idx, side="right").astype(jnp.int32)

        def seg(p, shift):
            lo_i = jnp.where(words_idx - shift >= 0,
                             edges[jnp.maximum(words_idx - shift, 0)], 0)
            hi_i = jnp.where(words_idx - shift >= 0,
                             edges_r[jnp.maximum(words_idx - shift, 0)], 0)
            return p[hi_i] - p[lo_i]

        return seg(pa_b, 0) + seg(pb_b, 1) + seg(pc_b, 2)

    batch_shape = lens.shape[:-1]
    if batch_shape:
        flat = lambda x: x.reshape((-1,) + x.shape[len(batch_shape):])
        words = jax.vmap(_one_block)(flat(w0), flat(pa), flat(pb), flat(pc))
        words = words.reshape(batch_shape + (n_words,))
    else:
        words = _one_block(w0, pa, pb, pc)
    return words, total_bits
