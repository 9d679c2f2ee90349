"""Adaptive per-block Golomb parameter selection (on device).

The reference uses fixed, caller-chosen parameters for a whole context
(lib/cmp.h cmp_params); this module adds the adaptive tier from the
BASELINE north star ("adaptive per-block Golomb-Rice parameter
selection"): each block picks its own Golomb parameter from the residual
statistics *after* preprocessing, and the chosen parameter travels in that
block's header (`encoder_param`), so the output remains a perfectly
ordinary AIRSPACE stream that any format decoder (including ours) decodes
without knowing adaptation happened.

Selection rule: for a geometric residual distribution the optimal Golomb
parameter satisfies g ~= -1/log2(p) with p = mu/(mu+1) where mu is the
mean of the zigzag-mapped residuals; the classic integer approximation is
g = max(1, round to power-of-two-ish of 0.69 * mu).  We evaluate a small
static ladder of candidate parameters exactly — computing each
candidate's true coded bit count for the whole block (closed form, no
packing needed) — and pick the argmin.  That is exact rate optimization,
vectorized over blocks, at the cost of len(ladder) elementwise passes.

All of this runs under jit on the VPU; only the ladder itself is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.bits import (
    golomb_optimal_outlier_zero,
    golomb_upper_bound,
)
from . import golomb

__all__ = ["DEFAULT_LADDER", "code_lengths_for", "select_golomb_zero",
           "encode_codewords_dynamic"]

_U32 = jnp.uint32

# Candidate Golomb parameters: powers of two cover the useful dynamic
# range for 16-bit residuals; odd values add fine-grained low-rate steps.
DEFAULT_LADDER = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128,
                  192, 256, 384, 512, 1024, 2048, 4096)


def code_lengths_for(mapped: jax.Array, g_par: int) -> jax.Array:
    """Per-block total coded bits under GOLOMB_ZERO with ``g_par``.

    ``mapped`` is (..., N) uint32 zigzag values.  Mirrors the encoder's
    exact length arithmetic (golomb len for value+1, or escape len for
    mapped >= outlier), so the argmin over a ladder is the true optimum.
    """
    g_log2 = int(g_par).bit_length() - 1
    outlier = min(golomb_optimal_outlier_zero(g_par, 16),
                  golomb_upper_bound(g_par, False, 16))
    cutoff = (2 << g_log2) - g_par
    len0 = g_log2 + 1
    m = mapped.astype(jnp.int32)
    esc = m >= outlier
    v = jnp.where(esc, 0, m + 1)
    in_g0 = v < cutoff
    group = jnp.where(in_g0, 0, (v - cutoff) // g_par)
    ln = jnp.where(in_g0, len0, len0 + 1 + group)
    ln = jnp.where(esc, len0 + 16, ln)
    return jnp.sum(ln.astype(jnp.int32), axis=-1)


def select_golomb_zero(residuals: jax.Array,
                       ladder: "tuple[int, ...]" = DEFAULT_LADDER):
    """Pick the rate-optimal GOLOMB_ZERO parameter per block.

    Args:
      residuals: (..., N) int32 sign-extended i16 residuals (post
        preprocessing).
      ladder: static candidate parameters.

    Returns:
      (g_par (...,) int32 chosen parameter, total_bits (...,) int32 the
      winning payload bit count).
    """
    mapped = golomb.zigzag(residuals)
    costs = jnp.stack([code_lengths_for(mapped, g) for g in ladder], axis=-1)
    best = jnp.argmin(costs, axis=-1)
    ladder_arr = jnp.asarray(ladder, jnp.int32)
    return ladder_arr[best], jnp.take_along_axis(
        costs, best[..., None], axis=-1)[..., 0]


def _ilog2_dyn(x: jax.Array) -> jax.Array:
    return golomb.ilog2(x)


def encode_codewords_dynamic(residuals: jax.Array, g_par: jax.Array):
    """GOLOMB_ZERO codewords with a per-block traced parameter.

    Like ops.golomb.encode_codewords but ``g_par`` is a (...,) int32
    array (one parameter per block) rather than a static constant; the
    derived outlier follows the reference's closed forms
    (encoder.c:63-182) elementwise.  Returns (hi, lo, len).
    """
    g = g_par.astype(_U32)[..., None]
    g_log2 = _ilog2_dyn(g)
    cutoff = (_U32(2) << g_log2) - g
    len0 = (g_log2 + _U32(1)).astype(jnp.int32)
    # optimal zero-escape outlier: cutoff + 16*g - 1, clamped to the
    # 32-bit-codeword upper bound (first_invalid = cutoff + (31-len0)*g)
    opt = cutoff + _U32(16) * g - _U32(1)
    # first value whose codeword would exceed 32 bits:
    # cutoff + (31 - ilog2(g)) * g = cutoff + (32 - len0) * g
    upper = cutoff + (_U32(32) - len0.astype(_U32)) * g
    outlier = jnp.minimum(opt, upper)

    m = golomb.zigzag(residuals)
    esc = m >= outlier
    v = jnp.where(esc, _U32(0), m + _U32(1))
    in_g0 = v < cutoff
    vg = jnp.where(in_g0, _U32(0), v - cutoff)
    group = vg // jnp.maximum(g, _U32(1))
    rem = vg - group * g
    unary = jnp.where(group >= _U32(32), _U32(0xFFFFFFFF),
                      (_U32(1) << jnp.minimum(group, _U32(31))) - _U32(1))
    sh = jnp.minimum(len0.astype(_U32) + _U32(1), _U32(31))
    cw_hi = (unary << sh) + (cutoff << _U32(1)) + rem
    cw = jnp.where(in_g0, v, cw_hi)
    ln = jnp.where(in_g0, len0, len0 + 1 + group.astype(jnp.int32))
    lo = jnp.where(esc, m, cw)
    ln = jnp.where(esc, len0 + 16, ln)
    return jnp.zeros_like(lo), lo, ln
