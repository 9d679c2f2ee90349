"""Pallas stream assembly: ragged frame concatenation on device.

The packed AIRSPACE stream is the byte-level concatenation of B
variable-length frames (reference programs/file.c:435-488 — the stream
IS the file layout).  Assembling it on device lets the encode wrapper
fetch only the compressed bytes (smaller than the frame word matrix by
the compression ratio) with no host memcpy at all.

Plain-XLA formulations both lose on TPU (BASELINE.md "Stream-assembly
finding"): the funnel-shift merge tree moves the worst-case buffer
log2(B) times (~1.1-3 ms at B=512), and the inverse-gather pass
scalarizes (general gathers with data-dependent indices don't lower to
bulk copies — 330 ms measured).  This kernel does what neither can:
the TPU grid executes SEQUENTIALLY, so one program per 8 frames
computes each frame's byte-shifted span (a uniform funnel shift —
every byte of a frame shares the same misalignment) and merges it into
the VMEM-resident output at its 128-lane-aligned window with a
read-modify-write vector store.  Boundary words are correct by a
last-writer argument: frame k's span starts at the first word whose
first byte belongs to frame k (the straddle word at the k-1/k boundary
is written by k-1, whose span formula ORs in frame k's leading bytes
from a prefetched first-words array), lanes below the span's window
offset keep the previously-written content, and tail garbage past k's
owned words is overwritten by k+1 before anything reads it.

The output is sized by the BUCKETED ACTUAL stream length (the wrapper
knows total bytes before assembling), not the worst case — so it stays
comfortably within VMEM and the kernel touches O(stream) bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["assemble_stream_pallas"]

_U32 = jnp.uint32
_LANES = 128
_ROWS = 8  # frames per grid program (Mosaic block sublane granularity)


def _kernel(cw_ref, pad_ref, len_ref, fst_ref, words_ref, out_ref):
    g = pl.program_id(0)
    wp = words_ref.shape[1]
    sp = wp + _LANES          # span: owned words fit in W+1 <= sp
    spp = sp + _LANES         # span window incl. alignment slack
    t4 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, sp), 1) * 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, spp), 1)

    # per-frame scalars of this program's 8 frames, as (8, 1) columns —
    # the span math below runs VECTORIZED across the sublane axis (a
    # (1, spp) op occupies a full 8-sublane vreg anyway, so computing
    # all 8 frames at once costs the same instructions as one did)
    k0 = g * _ROWS
    col = [jnp.stack([ref[k0 + r] for r in range(_ROWS)])
           .reshape(_ROWS, 1) for ref in (cw_ref, pad_ref, len_ref)]
    cw, pad, ln = col
    fw1 = jnp.stack([fst_ref[k0 + r] for r in range(_ROWS)]) \
        .reshape(_ROWS, 1)    # NEXT frame's first word (0 for the last)

    fw = words_ref[...]       # (8, Wp) frame words, BE values
    # span word t of frame r holds its bytes [4t+pad, 4t+pad+4): a
    # uniform funnel shift of (fw[t], fw[t+1]) left by pad*8 bits.
    # Shift amounts are masked to [0, 32) — the n==0 / s==0 cases are
    # handled by the selects (Mosaic has no unsigned vector clamp).
    hi = jnp.pad(fw, ((0, 0), (0, sp - wp)))
    lo = jnp.pad(jnp.concatenate(
        [fw[:, 1:], fw1], axis=1), ((0, 0), (0, sp - wp)))
    s = (pad * 8).astype(_U32)
    c = jnp.where(s == 0, hi,
                  (hi << s) | (lo >> ((_U32(32) - s) & _U32(31))))
    # bytes of span word t owned by frame r; 0 past the frame's end
    n = (jnp.clip(ln - (t4 + pad), 0, 4) * 8).astype(_U32)
    mask = jnp.where(n == 0, _U32(0),
                     (~_U32(0)) << ((_U32(32) - n) & _U32(31)))
    spill = jnp.where((n > 0) & (n < 32),
                      fw1 >> (n & _U32(31)), _U32(0))
    span = jnp.pad((c & mask) | spill, ((0, 0), (0, spp - sp)))

    # place each frame at its 128-aligned window: roll the span right
    # by the in-window lane offset (7 static rolls selected per row by
    # d's bits — TPU lane rotates are static-shift ops, the per-row
    # predicate is a broadcast select)
    d = cw - ((cw >> 7) << 7)
    rolled = span
    for bit in (1, 2, 4, 8, 16, 32, 64):
        rolled = jnp.where((d & bit) != 0,
                           jnp.roll(rolled, bit, axis=1), rolled)

    for r in range(_ROWS):    # merge over each window's current content
        cw_r = cw_ref[k0 + r]
        cw_al = pl.multiple_of((cw_r >> 7) << 7, _LANES)
        d_r = cw_r - ((cw_r >> 7) << 7)
        cur = out_ref[:, pl.ds(cw_al, spp)]
        out_ref[:, pl.ds(cw_al, spp)] = jnp.where(
            lane >= d_r, rolled[r:r + 1, :], cur)


@functools.partial(jax.jit, static_argnames=("out_words", "interpret",
                                             "swap"))
def assemble_stream_pallas(words_be: jax.Array, sizes: jax.Array,
                           out_words: int, interpret: bool = False,
                           swap: bool = False) -> jax.Array:
    """Concatenate B byte-aligned frames into one stream on device.

    ``words_be`` is the (B, W) frame word matrix holding big-endian
    word VALUES (the packer output, frame k's bytes left-justified);
    ``sizes`` the per-frame byte lengths.  ``out_words`` must be at
    least ``ceil(sum(sizes) / 4) + W + 3 * 128`` (the caller knows the
    exact total before assembling; bucket it — e.g. next power of two —
    to bound recompiles) and small enough for VMEM residence (~3 MB of
    stream per 16 MB core is comfortable).  Returns a 1-D uint32 array
    of ``out_words`` BE word VALUES — or, with ``swap=True``,
    host-memory-order words whose byte view IS the stream — valid
    through ``sizes.sum()`` bytes (the caller trims).
    """
    B, W = words_be.shape
    wp = -(-W // _LANES) * _LANES
    bp = -(-B // _ROWS) * _ROWS
    if wp != W or bp != B:
        # zero-length pad frames write zeroed spans into the output's
        # slack region (their cw is the stream end), never real words
        words_be = jnp.pad(words_be, ((0, bp - B), (0, wp - W)))
        sizes = jnp.pad(sizes.astype(jnp.int32), (0, bp - B))
    sz = sizes.astype(jnp.int32)
    ends = jnp.cumsum(sz)
    offs = ends - sz
    cw = (offs + 3) >> 2
    pad = (cw << 2) - offs
    firsts_next = jnp.concatenate(
        [words_be[1:, 0], jnp.zeros((1,), _U32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, wp), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, out_words), _U32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cw, pad, sz, firsts_next, words_be)[0]
    if swap:  # BE word values -> host memory order (byte view = stream)
        out = ((out << _U32(24))
               | ((out & _U32(0xFF00)) << _U32(8))
               | ((out >> _U32(8)) & _U32(0xFF00))
               | (out >> _U32(24)))
    return out


def stream_capacity_words(total_bytes: int, n_words: int) -> int:
    """Bucketed ``out_words`` for :func:`assemble_stream_pallas`."""
    need = -(-total_bytes // 4) + (-(-n_words // _LANES) * _LANES) \
        + 3 * _LANES
    return 1 << max(need - 1, 1).bit_length()
