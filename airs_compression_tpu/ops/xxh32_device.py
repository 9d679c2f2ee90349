"""Batched on-device XXH32 — the AIRSPACE block checksum, lane-parallel.

The reference computes XXH32 inline while encoding each block
(lib/compress/cmp.c:314-319, lib/common/header.c:137-163, seed 419764627
over the samples as big-endian u16 bytes).  The host wrapper used to do
the same sequentially per block in the middle of the device pipeline;
per-block checksums are independent, so here B blocks hash at once:

* XXH32's only cross-word dependency is its 4-lane accumulator recurrence
  ``acc = rotl13(acc + w * P2) * P1`` over 16-byte stripes — strictly
  sequential along the stripe axis but elementwise across (block, lane),
  i.e. a (B, 4)-wide chain of N/8 cheap VPU steps.
* :func:`xxh32_blocks` runs that chain as a ``lax.scan`` (any backend).
* :func:`xxh32_blocks_pallas` streams the stripes through VMEM with the
  accumulators held in an (4, 8, 128) register tile — 1024 blocks per
  grid tile, stripe chunks as the inner grid axis so one scratch
  accumulator persists across chunks (no HBM round-trips for state).

Both are bit-exact against utils/xxh32 (itself pinned to the vendored
xxhash 0.8.3 the reference uses, subprojects/xxhash.wrap:1-14).

Byte order note: the AIRSPACE convention hashes *big-endian* sample
bytes, while XXH32 consumes its stripe words *little-endian* — so each
u32 lane word is ``bswap16(s[2j]) | bswap16(s[2j+1]) << 16``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.xxh32 import CHECKSUM_SEED

__all__ = ["xxh32_blocks", "xxh32_blocks_pallas", "pallas_xxh32_supported",
           "checksum_blocks_device"]

_U32 = jnp.uint32
_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393

_LANES = 128
_SUB = 8
_TILE = _SUB * _LANES


def _rotl(x, r: int):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _lane_words(x: jax.Array) -> jax.Array:
    """(B, N) u16-valued samples -> (B, N//2) LE stripe words of BE bytes."""
    s = x.astype(_U32) & _U32(0xFFFF)
    sw = ((s & _U32(0xFF)) << _U32(8)) | (s >> _U32(8))  # bswap16
    return sw[:, 0::2] | (sw[:, 1::2] << _U32(16))


def _finalize(h: jax.Array) -> jax.Array:
    h = (h ^ (h >> _U32(15))) * _U32(_P2)
    h = (h ^ (h >> _U32(13))) * _U32(_P3)
    return h ^ (h >> _U32(16))


@functools.partial(jax.jit, static_argnames=("seed",))
def xxh32_blocks(x: jax.Array, seed: int = CHECKSUM_SEED) -> jax.Array:
    """XXH32 of each row's big-endian u16 bytes -> (B,) uint32.

    ``x`` is (B, N) integer samples (any int dtype; low 16 bits hashed as
    two BE bytes each).  Pure XLA: a ``lax.scan`` over 16-byte stripes.
    Matches utils.xxh32.cmp_checksum row-for-row for any N >= 1.
    """
    B, N = x.shape
    n_bytes = 2 * N
    n_stripes = n_bytes // 16

    if N % 2:
        w = _lane_words(x[:, : N - 1])  # (B, (N-1)//2)
        s_last = x[:, -1].astype(_U32) & _U32(0xFFFF)
    else:
        w = _lane_words(x)
        s_last = None

    if n_stripes:
        stripes = jnp.moveaxis(
            w[:, : 4 * n_stripes].reshape(B, n_stripes, 4), 1, 0)

        init = jnp.broadcast_to(
            jnp.array([(seed + _P1 + _P2) & 0xFFFFFFFF,
                       (seed + _P2) & 0xFFFFFFFF,
                       seed & 0xFFFFFFFF,
                       (seed - _P1) & 0xFFFFFFFF], dtype=_U32),
            (B, 4))

        def step(acc, wv):
            return _rotl(acc + wv * _U32(_P2), 13) * _U32(_P1), None

        acc, _ = jax.lax.scan(step, init, stripes)
        h = (_rotl(acc[:, 0], 1) + _rotl(acc[:, 1], 7)
             + _rotl(acc[:, 2], 12) + _rotl(acc[:, 3], 18))
    else:
        h = jnp.full((B,), (seed + _P5) & 0xFFFFFFFF, _U32)
    h = h + _U32(n_bytes)

    # 4-byte tail words after the last full stripe
    for j in range(4 * n_stripes, w.shape[1]):
        h = _rotl(h + w[:, j] * _U32(_P3), 17) * _U32(_P4)
    if s_last is not None:
        # final odd sample: two single BE bytes
        for b in (s_last >> _U32(8), s_last & _U32(0xFF)):
            h = _rotl(h + b * _U32(_P5), 11) * _U32(_P1)
    return _finalize(h)


_UNROLL = 32  # stripes per loop step: amortizes fori_loop overhead over
              # the (irreducible) serial accumulator chain


def _xxh_kernel(n_chunks: int, chunk: int, seed: int, w_ref, out_ref,
                acc_ref):
    from jax.experimental import pallas as pl

    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[0] = jnp.full((_SUB, _LANES), (seed + _P1 + _P2) & 0xFFFFFFFF,
                              _U32)
        acc_ref[1] = jnp.full((_SUB, _LANES), (seed + _P2) & 0xFFFFFFFF, _U32)
        acc_ref[2] = jnp.full((_SUB, _LANES), seed & 0xFFFFFFFF, _U32)
        acc_ref[3] = jnp.full((_SUB, _LANES), (seed - _P1) & 0xFFFFFFFF, _U32)

    u = _UNROLL if chunk % _UNROLL == 0 else 1

    def body(i, _):
        acc = acc_ref[:]
        for k in range(u):
            w = w_ref[0, 0, i * u + k]  # (4, SUB, LANES)
            acc = _rotl(acc + w * _U32(_P2), 13) * _U32(_P1)
        acc_ref[:] = acc
        return 0

    jax.lax.fori_loop(0, chunk // u, body, 0)

    @pl.when(c == n_chunks - 1)
    def _():
        h = (_rotl(acc_ref[0], 1) + _rotl(acc_ref[1], 7)
             + _rotl(acc_ref[2], 12) + _rotl(acc_ref[3], 18))
        out_ref[0] = h[None]


def pallas_xxh32_supported(N: int) -> bool:
    """The streaming kernel needs whole stripes: 2N % 16 == 0."""
    return N >= 8 and N % 8 == 0


@functools.partial(jax.jit, static_argnames=("seed", "interpret"))
def xxh32_blocks_pallas(x: jax.Array, seed: int = CHECKSUM_SEED,
                        interpret: bool = False) -> jax.Array:
    """TPU streaming XXH32: (B, N) samples -> (B,) u32, N % 8 == 0.

    1024 blocks per tile; the stripe axis is the inner grid dimension so
    the 4 accumulators live in one VMEM scratch across chunks.  The
    stripe-major relayout is one XLA transpose (a single HBM pass).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = x.shape
    assert pallas_xxh32_supported(N), "needs whole 16-byte stripes"
    n_stripes = N // 8
    # chunk: inner-grid stripe count; divides n_stripes, VMEM-friendly
    chunk = n_stripes
    while chunk > 256:
        if chunk % 2:
            break
        chunk //= 2
    n_chunks = n_stripes // chunk

    B_pad = -(-B // _TILE) * _TILE
    if B_pad != B:
        x = jnp.concatenate(
            [x, jnp.zeros((B_pad - B, N), x.dtype)], axis=0)
    tiles = B_pad // _TILE

    w = _lane_words(x)  # (B_pad, 4 * n_stripes)
    # [tile, chunk, stripe, k, sub, lane] <- w[b, 4*(chunk*Cs+stripe)+k]
    wt = (w.reshape(tiles, _SUB, _LANES, n_chunks, chunk * 4)
           .transpose(0, 3, 4, 1, 2)
           .reshape(tiles, n_chunks, chunk, 4, _SUB, _LANES))

    out = pl.pallas_call(
        functools.partial(_xxh_kernel, n_chunks, chunk, seed),
        grid=(tiles, n_chunks),
        out_shape=jax.ShapeDtypeStruct((tiles, 1, _SUB, _LANES), _U32),
        in_specs=[pl.BlockSpec((1, 1, chunk, 4, _SUB, _LANES),
                               lambda i, c: (i, c, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, _SUB, _LANES),
                               lambda i, c: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, _SUB, _LANES), _U32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wt)
    h = out.reshape(B_pad)[:B] + _U32(2 * N)
    return _finalize(h)


def use_device_checksum() -> bool:
    """Should checksums route through the device implementations?

    True on any non-CPU backend; ``AIRS_TPU_XXH32=xla|pallas`` forces it
    on CPU too (tests exercise the device path there).  The single
    routing predicate for every caller (BatchCompressor, chunked
    decompress verification).
    """
    import os

    if os.environ.get("AIRS_TPU_XXH32") in ("xla", "pallas"):
        return True
    return jax.default_backend() != "cpu"


def checksum_blocks_device(x: jax.Array) -> jax.Array:
    """AIRSPACE per-block checksum on the best available device path."""
    import os

    mode = os.environ.get("AIRS_TPU_XXH32", "auto")
    on_tpu = jax.default_backend() != "cpu"
    if (mode != "xla" and pallas_xxh32_supported(x.shape[-1])
            and (mode == "pallas" or on_tpu)):
        return xxh32_blocks_pallas(x)
    return xxh32_blocks(x)
