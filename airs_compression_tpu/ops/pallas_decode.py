"""Pallas lockstep Golomb decoder — gather-free streaming on the VPU.

Golomb decoding is bit-serial per stream, so the only parallelism is
across blocks.  The XLA scan decoder (ops/decode.py) pays a per-step
``take_along_axis`` gather from HBM for every one of the N steps, which
caps it at ~0.06 GB/s.  This kernel keeps 1024 blocks of decode state as
``(8, 128)`` registers/VMEM tiles and replaces the gather with a
**slab pyramid**: each lane's next words are staged through progressively
smaller VMEM slabs, each refreshed from its parent at a power-of-2
cadence by one-hot selects over *aligned* candidate offsets (full-tile
selects, no gather):

    stream (C words, VMEM)
      -> mid slab   512 words  (align 128, refresh every 256 steps)
      -> near slab  128 words  (align  32, refresh every  64 steps)
      -> next slab   16 words  (align   8, refresh every   8 steps)
      -> 64-bit left-aligned window (register), 1 word refill per phase

Refresh cadences are halved when the stream's worst-case per-sample
advance exceeds the full-cadence margin (28 bits) so slab margins always
cover the cursor; for GOLOMB_MULTI the bound is derived TIGHTLY from the
header's (g, outlier) — see ``_decode_worst_bits`` — so recommended MULTI
configs run at full cadence and only genuinely wide escapes (or foreign/
dynamic parameters) pay the halved one.  Codes wider than 32 bits are
decoded in two <=32-bit phases with a refill between, so a 64-bit window
suffices.

The per-step decode math reuses ops/decode.py's closed forms (inverting
reference encoder.c:303-378).  Output is written row-per-step; the XLA
wrapper transposes back and runs the batched inverse preprocessors.
Bit-exact vs the XLA scan decoder (tests, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import golomb, preprocess
from .decode import (BAD_CODE_POISON_BITS, _clz32, _decode_one,
                     _golomb_terms, _take_bits)
from .encode import PassConfig

__all__ = ["decode_blocks_pallas", "pallas_decode_supported"]

_U32 = jnp.uint32
_LANES = 128
_SUB = 8          # sublane rows of lockstep state -> 1024 blocks per tile
_TILE = _SUB * _LANES


def _decode_worst_bits(cfg: PassConfig, dynamic: bool) -> int:
    """Tight per-sample worst-case cursor advance for the cadence plan.

    ``cfg.worst_bits_per_sample`` is the ENCODE-side buffer bound — for
    GOLOMB_MULTI a blanket 48 (32-bit codeword + 16 raw bits), which
    used to halve every slab refresh cadence for ALL MULTI streams and
    cost ~25% of decode throughput (round-4 verdict Weak #5).  But a
    conforming stream's true worst advance is derivable statically from
    (g, outlier): escapes encode golomb(outlier + level) + (level+1)*2
    raw bits with level <= ilog2(0xFFFF - outlier)/2 (the encoder can
    only emit 16-bit mapped values, reference encoder.c:341-374), and
    non-escapes top out at golomb(outlier - 1).  For the recommended
    MULTI configs this lands at <= 28 bits — within the full-cadence
    margin.  Malformed streams may advance further, but every slab read
    is a bounded select and malformed codewords set the poison flag, so
    they decode to flagged garbage exactly as before (the
    integrity/poison semantics do not depend on the cadence).

    Falls back to the blanket bound for per-lane dynamic parameters
    (``cfg.outlier`` is then only a cap) and for out-of-range header
    values (foreign streams — conservative, halved cadence).
    """
    if cfg.enc_type != 2 or dynamic:
        return cfg.worst_bits_per_sample
    g, o = int(cfg.g_par), int(cfg.outlier)
    if not (1 <= g <= 0xFFFF and 1 <= o <= 0xFFFF):
        return cfg.worst_bits_per_sample
    g_log2 = g.bit_length() - 1
    cutoff = (2 << g_log2) - g
    len0 = g_log2 + 1

    def golomb_bits(v: int) -> int:
        return len0 if v < cutoff else len0 + 1 + (v - cutoff) // g

    max_diff = 0xFFFF - o
    level_max = 0 if max_diff < 4 else (max_diff.bit_length() - 1) // 2
    escape_bits = golomb_bits(o + level_max) + (level_max + 1) * 2
    normal_bits = golomb_bits(o - 1)
    return min(max(escape_bits, normal_bits), cfg.worst_bits_per_sample)


def _slab_plan(C_in: int, worst_bits: int):
    """Pyramid levels bottom-up: (size, align, cadence_steps).

    Margins: a level of S words aligned to A, refreshed every T steps,
    must keep covering its child whose base advances <= W*T bits; the
    child base is at most (A-1) + child_size words past this level's
    base right after refresh.  Sizes/cadences chosen so
    (S - A + 1 - child_size) * 32 >= W * T with power-of-2 cadences.
    """
    wide = worst_bits > 28
    levels = [(16, 8, 4 if wide else 8)]
    if C_in > 160:
        levels.append((128, 32, 32 if wide else 64))
    if C_in > 640:
        levels.append((512, 128, 128 if wide else 256))
    return levels  # bottom (next slab) .. top (below stream)


def _refresh(dst_ref, src_ref, src_size: int, dst_size: int, align: int,
             rel):
    """dst <- src[rel : rel + dst_size] per lane, rel multiple of align.

    ``rel`` is (SUB, LANES) int32 (child base - parent base).  One select
    per aligned candidate, each a full (dst_size, 8, 128) where().
    """
    cur = dst_ref[:]
    for k in range((src_size - dst_size) // align + 1):
        cand = src_ref[k * align:k * align + dst_size]
        cur = jnp.where(rel[None] == k * align, cand, cur)
    dst_ref[:] = cur


def _onehot_word(slab_ref, size: int, off):
    """slab[off] per lane; ``off`` (sub, LANES) int32 in [0, size)."""
    w = jnp.zeros(off.shape, _U32)
    for j in range(size):
        w = jnp.where(off == j, slab_ref[j], w)
    return w


def _make_kernel(cfg: PassConfig, n_samples: int, C_in: int, C_pad: int,
                 dynamic: bool = False, sub: int = _SUB):
    levels = _slab_plan(C_in, _decode_worst_bits(cfg, dynamic))
    two_phase = cfg.enc_type == 2  # MULTI escapes can exceed 32 bits
    wi0 = cfg.hdr_bits >> 5
    r0 = cfg.hdr_bits & 31

    def kernel(words_ref, *rest):
        # inputs: words [+ per-lane (g, outlier) planes when dynamic];
        # outputs: out, endpos; slabs: one VMEM scratch per pyramid level
        # (bottom..top) plus a state scratch: rows 0..len(levels)-1 =
        # per-level base, then hi, lo, navail(int), wi
        if dynamic:
            par_ref, out_ref, endpos_ref, *slabs = rest
            g_lane = par_ref[0, 0]            # (SUB, LANES) u32
            out_lane = par_ref[0, 1]
        else:
            out_ref, endpos_ref, *slabs = rest
            g_lane = out_lane = None
        *slab_refs, st = slabs
        w = words_ref[0]  # (C_pad, SUB, LANES)
        n_lv = len(levels)

        def refresh_level(li, wi):
            size, align, _ = levels[li]
            base = (wi // align) * align
            if li == n_lv - 1:
                src, src_size, rel = w, C_pad, base
            else:
                psize = levels[li + 1][0]
                src, src_size = slab_refs[li + 1], psize
                rel = base - st[4 + li + 1].astype(jnp.int32)
            _refresh(slab_refs[li], src, src_size, size, align, rel)
            st[4 + li] = base.astype(_U32)

        # ---- initial state -------------------------------------------
        # window holds bits [hdr_bits, (wi0+2)*32): navail = 64 - r0
        w0, w1 = w[wi0].astype(_U32), w[wi0 + 1].astype(_U32)
        if r0:
            hi = (w0 << _U32(r0)) | (w1 >> _U32(32 - r0))
            lo = w1 << _U32(r0)
        else:
            hi, lo = w0, w1
        zero = jnp.zeros((sub, _LANES), jnp.int32)
        st[0] = hi
        st[1] = lo
        st[2] = zero + (64 - r0)
        st[3] = zero + (wi0 + 2)
        st[4 + n_lv] = zero.astype(_U32)  # malformed-codeword flag
        for li in reversed(range(n_lv)):
            refresh_level(li, zero + (wi0 + 2))

        near_size = levels[0][0]

        def refill(hi, lo, navail, wi):
            """One conditional word refill (branch-free)."""
            do = navail <= 32
            off = jnp.where(do, wi - st[4].astype(jnp.int32), 0)
            nw = _onehot_word(slab_refs[0], near_size, off)
            nw = jnp.where(do, nw, _U32(0))
            sh_hi = jnp.clip(navail - 1, 0, 31).astype(_U32)
            sh_lo = jnp.clip(31 - navail, 0, 31).astype(_U32)
            hi_add = jnp.where(navail == 0, nw, (nw >> _U32(1)) >> sh_hi)
            lo_add = jnp.where(navail >= 32, nw, (nw << _U32(1)) << sh_lo)
            hi = hi | jnp.where(do, hi_add, _U32(0))
            lo = lo | jnp.where(do, lo_add, _U32(0))
            return hi, lo, navail + jnp.where(do, 32, 0), \
                wi + jnp.where(do, 1, 0)

        def consume(hi, lo, navail, nbits):
            """Shift the window left by nbits in [0, 32]."""
            n = nbits.astype(_U32)
            big = nbits >= 32
            sh = jnp.where(big, _U32(0), n)
            hi2 = (hi << sh) | jnp.where(
                sh == 0, _U32(0), lo >> ((_U32(32) - sh) & _U32(31)))
            lo2 = lo << sh
            hi3 = jnp.where(big, lo, hi2)
            lo3 = jnp.where(big, _U32(0), lo2)
            return hi3, lo3, navail - nbits

        def step(i, _):
            # slab refreshes, top level first (scalar-predicated)
            wi_cur = st[3].astype(jnp.int32)
            for li in reversed(range(n_lv)):
                cad = levels[li][2]

                @pl.when(jnp.logical_and(i % cad == 0, i > 0))
                def _(li=li, wi_cur=wi_cur):
                    refresh_level(li, wi_cur)

            hi, lo = st[0], st[1]
            navail, wi = st[2].astype(jnp.int32), st[3].astype(jnp.int32)

            if not two_phase:
                val, used, bad = _decode_one(cfg, hi, lo, g_lane, out_lane)
                st[4 + n_lv] = st[4 + n_lv] | bad.astype(_U32)
                hi, lo, navail = consume(hi, lo, navail, used)
                hi, lo, navail, wi = refill(hi, lo, navail, wi)
            else:
                # phase 1: Golomb part (<= 32 bits)
                g_par, g_log2, cutoff, outlier = _golomb_terms(
                    cfg, g_lane, out_lane)
                q = _clz32(~hi).astype(jnp.int32)
                rbits = _take_bits(hi, lo, q + 1,
                                   jnp.broadcast_to(g_log2, q.shape))
                long_form = rbits >= cutoff
                extra = _take_bits(hi, lo, q + 1 + g_log2,
                                   jnp.where(long_form, 1, 0))
                rem = jnp.where(long_form,
                                ((rbits << _U32(1)) | extra) - cutoff,
                                rbits)
                v = q.astype(_U32) * g_par + rem
                used1 = q + 1 + g_log2 + jnp.where(long_form, 1, 0)
                # Golomb part over the 32-bit codeword cap = malformed
                st[4 + n_lv] = st[4 + n_lv] | (used1 > 32).astype(_U32)
                hi, lo, navail = consume(hi, lo, navail, used1)
                hi, lo, navail, wi = refill(hi, lo, navail, wi)
                # phase 2: escape raw bits (<= 32)
                esc = v >= outlier
                level = jnp.where(esc, v - outlier, _U32(0))
                nbits = jnp.where(esc,
                                  ((level + _U32(1)) * _U32(2)).astype(
                                      jnp.int32), 0)
                st[4 + n_lv] = st[4 + n_lv] | (nbits > 32).astype(_U32)
                nbits = jnp.minimum(nbits, 32)  # keep consume() in range
                diff = _take_bits(hi, lo, jnp.zeros_like(nbits), nbits)
                val = jnp.where(esc, outlier + diff, v)
                # a >16-bit mapped value is non-emittable -> malformed
                st[4 + n_lv] = st[4 + n_lv] | (val > _U32(0xFFFF)).astype(
                    _U32)
                hi, lo, navail = consume(hi, lo, navail, nbits)
                hi, lo, navail, wi = refill(hi, lo, navail, wi)

            st[0] = hi
            st[1] = lo
            st[2] = navail.astype(_U32)
            st[3] = wi.astype(_U32)
            out_ref[0, pl.ds(i, 1)] = val[None]
            return 0

        # unroll samples per loop iteration to amortize the fori_loop's
        # per-iteration overhead (the decode chain itself is serial;
        # cadence predicates use the true sample index).  8 is the
        # measured plateau on v5e (2->8 is +10%, 16/32 flat).
        import os as _os

        u = int(_os.environ.get("AIRS_TPU_DECODE_UNROLL", "8"))
        if u > 1 and n_samples % u == 0:
            def stepu(j, _):
                for k in range(u):
                    step(j * u + k, 0)
                return 0

            jax.lax.fori_loop(0, n_samples // u, stepu, 0)
        else:
            jax.lax.fori_loop(0, n_samples, step, 0)
        endpos_ref[:] = (st[3].astype(jnp.int32) * 32
                         - st[2].astype(jnp.int32)
                         + st[4 + n_lv].astype(jnp.int32)
                         * BAD_CODE_POISON_BITS)[None, None]

    return kernel, levels


def decode_blocks_pallas(cfg: PassConfig, words: jax.Array,
                         model: jax.Array, n_samples: int,
                         interpret: bool = False,
                         g_dyn=None, outlier_dyn=None,
                         sub: "int | None" = None):
    """Drop-in for ``decode_blocks_device`` (same contract) on TPU.

    ``words`` is (B, C) uint32 whole frames (header included); any B >= 1
    (batches are padded internally to the block tile, the kernel's
    minimum granularity).  ``g_dyn``/``outlier_dyn`` optionally carry
    per-block Golomb parameters (header-driven decode of adaptive
    streams); ``cfg.g_par`` must then upper-bound every lane's parameter
    so the slab cadence plan stays safe.  ``sub`` picks the sublane tile
    (8 -> 1024 blocks/tile, 4 -> 512); the default is 8 — the half tile
    is opt-in (per call or ``AIRS_TPU_DECODE_SUB``) because it measures
    no faster on hardware (BASELINE.md).  Returns
    (samples (B, N) int32, end_bitpos (B,)).
    """
    import os as _os

    if sub is None:
        # AIRS_TPU_DECODE_SUB forces the half-tile (sub=4) instantiation;
        # default stays 8 — whether the half tile is actually cheaper is
        # an empirical hardware question (Mosaic pads 4-sublane vregs to
        # 8), measured by the bench's dual-tile B=512 stage and recorded
        # in BASELINE.md
        sub = int(_os.environ.get("AIRS_TPU_DECODE_SUB", "0")) or _SUB
    return _decode_blocks_pallas(cfg, words, model, n_samples, interpret,
                                 g_dyn, outlier_dyn, sub)


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "interpret",
                                             "sub"))
def _decode_blocks_pallas(cfg: PassConfig, words: jax.Array,
                          model: jax.Array, n_samples: int,
                          interpret: bool, g_dyn, outlier_dyn, sub: int):
    B, C_in = words.shape
    dynamic = g_dyn is not None
    if dynamic:
        # one (2, B) u32 plane pair: g and outlier; padding lanes get g=1
        if outlier_dyn is None:
            outlier_dyn = jnp.full((B,), cfg.outlier, _U32)
        par = jnp.stack([jnp.maximum(g_dyn.astype(_U32), _U32(1)),
                         outlier_dyn.astype(_U32)])
    tile = sub * _LANES
    B_pad = -(-B // tile) * tile
    if B_pad != B:
        # zero frames decode to garbage rows that are sliced away below;
        # every kernel access is a bounded full-tile select, so padding
        # rows are structurally safe
        words = jnp.concatenate(
            [words, jnp.zeros((B_pad - B, C_in), _U32)], axis=0)
        model = jnp.concatenate(
            [model, jnp.zeros((B_pad - B,) + model.shape[1:], model.dtype)],
            axis=0)
        if dynamic:
            par = jnp.concatenate(
                [par, jnp.ones((2, B_pad - B), _U32)], axis=-1)
    tiles = B_pad // tile
    # pad so every aligned candidate slice of the top slab is in bounds
    top = 512 if C_in > 640 else (128 if C_in > 160 else 16)
    C_pad = C_in + top
    w = jnp.concatenate(
        [words, jnp.zeros((B_pad, C_pad - C_in), _U32)], axis=-1)
    w_css = w.reshape(tiles, sub, _LANES, C_pad).transpose(0, 3, 1, 2)

    kernel, levels = _make_kernel(cfg, n_samples, C_in, C_pad,
                                  dynamic=dynamic, sub=sub)
    ins = [w_css]
    in_specs = [pl.BlockSpec((1, C_pad, sub, _LANES),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if dynamic:
        ins.append(par.reshape(2, tiles, sub, _LANES).transpose(1, 0, 2, 3))
        in_specs.append(pl.BlockSpec((1, 2, sub, _LANES),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((size, sub, _LANES), _U32)
               for size, _, _ in levels]
    # state rows: hi, lo, navail, wi, per-level bases, bad-codeword flag
    scratch.append(pltpu.VMEM((5 + len(levels), sub, _LANES), _U32))
    out, endpos = pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=(jax.ShapeDtypeStruct((tiles, n_samples, sub, _LANES),
                                        _U32),
                   jax.ShapeDtypeStruct((tiles, 1, sub, _LANES), jnp.int32)),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, n_samples, sub, _LANES),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, sub, _LANES),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    # out[tile, step, s, lane] -> (B, N); padding rows sliced away
    vals = out.transpose(0, 2, 3, 1).reshape(B_pad, n_samples)[:B]
    end_pos = endpos.reshape(B_pad)[:B]

    if cfg.enc_type == 0:
        residuals = ((vals.astype(jnp.int32) & 0xFFFF) ^ 0x8000) - 0x8000
    else:
        residuals = golomb.unzigzag(vals)
    samples = preprocess.preprocess_inverse(
        cfg.prep, residuals, model[:B] if cfg.prep == 3 else None)
    return samples, end_pos


def pallas_decode_supported(B: int) -> bool:
    """Any batch size is supported (internal padding to the 1024 tile)."""
    return B >= 1
