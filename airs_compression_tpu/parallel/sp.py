"""Stream parallelism: one huge block split across devices (shard_map).

The codec's analog of sequence/context parallelism (SURVEY §2.5): a single
AIRSPACE block too large for one chip's comfort is split along the sample
axis over the mesh.  Communication pattern (all over ICI):

* DIFF preprocessing needs a 1-sample halo — the previous shard's last
  sample — exchanged with ``ppermute``.
* Per-shard codeword bit lengths are ``all_gather``-ed to derive each
  shard's absolute bit offset in the single payload (an exclusive scan of
  D scalars).
* Each shard bit-packs locally at offset 0, then funnel-shifts its word
  stream by (offset mod 32): the result lands on the global 32-bit word
  grid starting at word offset/32.  Adjacent shards overlap in exactly one
  boundary word, OR-merged during assembly.

MODEL preprocessing is elementwise (no halo).  IWT needs per-level halos
and is intentionally kept intra-block (use data parallelism for many IWT
blocks instead).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format.errors import CmpError, CmpErrorCode
from ..format.header import CmpHeader
from ..format.params import CmpParams, EncoderType, Preprocessing
from ..ops import bitpack, golomb
from ..ops.encode import make_pass_config
from ..ops.preprocess import wrap16
from ..utils.xxh32 import cmp_checksum

__all__ = ["compress_long_stream"]


def _shard_encode(x_loc, prev_last, cfg):
    """Per-shard: diff-with-halo -> codewords -> local pack -> global shift."""
    axis = "sp"
    d = jax.lax.axis_index(axis)

    if cfg.prep == int(Preprocessing.DIFF):
        prev = jnp.concatenate([prev_last, x_loc[:-1]])
        res = wrap16(x_loc - prev)
        # the very first sample of the stream is stored raw (d[0]=x[0])
        res = jnp.where((d == 0) & (jnp.arange(x_loc.shape[0]) == 0),
                        wrap16(x_loc), res)
    elif cfg.prep == int(Preprocessing.NONE):
        res = x_loc
    else:
        raise ValueError("long-stream mode supports NONE/DIFF preprocessing")

    hi, lo, lens = golomb.encode_codewords(res, cfg.enc_type, cfg.g_par,
                                           cfg.outlier)
    n_loc = lens.shape[-1]
    K = 1 << (n_loc - 1).bit_length() if n_loc > 1 else 1
    if K != n_loc:
        pad = jnp.zeros((K - n_loc,), jnp.uint32)
        hi = jnp.concatenate([hi, pad])
        lo = jnp.concatenate([lo, pad])
        lens = jnp.concatenate([lens, jnp.zeros((K - n_loc,), jnp.int32)])
    local_bits = jnp.sum(lens)
    all_bits = jax.lax.all_gather(local_bits, axis)  # (D,)
    before = jnp.sum(jnp.where(jnp.arange(all_bits.shape[0]) < d, all_bits, 0))
    offset = cfg.hdr_bits + before  # absolute payload bit offset
    total_payload_bits = jnp.sum(all_bits)

    words, _ = bitpack.pack_codes_tree(hi, lo, lens,
                                       cfg.worst_bits_per_sample)
    # shift local stream right by r = offset % 32 onto the global word grid
    r = (offset % 32).astype(jnp.uint32)
    wprev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), words[:-1]])
    shift_hi = jnp.where(r == 0, jnp.uint32(0),
                         wprev << jnp.where(r == 0, jnp.uint32(0),
                                            jnp.uint32(32) - r))
    shifted = (words >> r) | shift_hi
    # one extra tail word carrying bits pushed past the local capacity
    tail = jnp.where(r == 0, jnp.uint32(0),
                     words[-1] << jnp.where(r == 0, jnp.uint32(0),
                                            jnp.uint32(32) - r))
    out_words = jnp.concatenate([shifted, tail[None]])
    return out_words, offset // 32, local_bits, total_payload_bits


def compress_long_stream(mesh: Mesh, params: CmpParams, samples_u16,
                         identifier: int = 0, sequence_number: int = 0):
    """Compress ONE long u16 stream as a single AIRSPACE block, sharded.

    ``samples_u16`` length must divide evenly by the mesh size.  Returns
    the complete frame bytes (bit-identical to the single-device encoder).
    """
    params.validate()
    x_np = np.ascontiguousarray(np.asarray(samples_u16, dtype=np.uint16))
    n = x_np.size
    (axis,) = mesh.axis_names
    D = mesh.devices.size
    if n % D:
        raise CmpError(CmpErrorCode.SRC_SIZE_WRONG,
                       f"stream length {n} not divisible by mesh size {D}")
    if 2 * n > (1 << 24) - 1:
        raise CmpError(CmpErrorCode.HDR_ORIGINAL_TOO_LARGE)
    cfg = make_pass_config(params, False, True)
    if cfg.prep not in (0, 1):
        raise CmpError(CmpErrorCode.PARAMS_INVALID,
                       "long-stream mode supports NONE/DIFF preprocessing")

    n_loc = n // D

    x = jnp.asarray(x_np.view(np.int16), jnp.int32).reshape(D, n_loc)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis), P(axis), P(axis)))
    def run(x_sh):
        x_loc = x_sh[0]
        # halo: previous shard's last sample (ppermute ring shift by +1)
        last = x_loc[-1:]
        prev_last = jax.lax.ppermute(
            last, axis, [(i, (i + 1) % D) for i in range(D)])
        w, w0, lbits, tbits = _shard_encode(x_loc, prev_last, cfg)
        return w[None], w0[None], lbits[None], tbits[None]

    words, starts, local_bits, total_bits = run(x)
    words = np.asarray(words)
    starts = np.asarray(starts)
    payload_bits = int(np.asarray(total_bits)[0])

    # frame assembly (host): header + OR-merged shard spans + checksum
    bits = cfg.hdr_bits + payload_bits
    if cfg.checksum:
        pad = (-bits) % 8
        total = bits + pad + 32
    else:
        total = bits
    size = (total + 7) >> 3

    hdr = CmpHeader(
        compressed_size=size, original_size=2 * n, identifier=identifier,
        sequence_number=sequence_number, preprocessing=cfg.prep,
        checksum_enabled=1 if cfg.checksum else 0, encoder_type=cfg.enc_type,
        model_rate=0,
        encoder_param=cfg.g_par if cfg.enc_type else 0,
        encoder_outlier=cfg.outlier if cfg.enc_type else 0)

    out = np.zeros(((total + 31) // 32,), dtype=np.uint32)
    for dsh in range(D):
        span = words[dsh]
        w0 = int(starts[dsh])
        end = min(w0 + span.size, out.size)
        out[w0:end] |= span[: end - w0]
    frame = bytearray(out.astype(">u4").tobytes()[:size])
    frame[: hdr.size] = hdr.serialize()
    if cfg.checksum:
        frame[size - 4 : size] = cmp_checksum(x_np).to_bytes(4, "big")
    return bytes(frame)
