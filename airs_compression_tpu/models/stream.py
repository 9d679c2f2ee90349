"""Batched stream compressor: the flagship device pipeline.

Drives the on-device encoder (ops/encode.py) over B independent block
chains in lockstep: one call compresses one frame per chain, advancing
every chain's pass state (sequence number, identifier, model) with the
exact semantics of B independent reference contexts processed in block
order (reference cmp.c:213-393).

Host responsibilities (everything the device cannot or should not do):
  * identifier draws from the process timestamp source, in block order,
    including the double-draw on an uncompressed fallback (cmp.c:380-392 +
    engine re-reset) — fallen-back frames get their header identifier
    bytes patched after the device call;
  * slicing the device's fixed-capacity word buffers into per-frame bytes.

XXH32 checksums are computed batch-parallel ON DEVICE
(ops/xxh32_device.py) on both the encode and the verify side; the
sequential host implementation remains the CPU fallback.

Mixed-phase batches (some chains on a primary pass, others on secondary —
possible after a fallback resets one chain) are handled by encoding the
batch under both pass configs and selecting per block.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import context as _context
from ..format.dtypes import CmpType
from ..format.errors import CmpError, CmpErrorCode
from ..format.params import CmpParams, Preprocessing
from ..ops.encode import (
    encode_blocks_device,
    make_pass_config,
    model_update_step,
    worst_case_words,
)
from ..utils.xxh32 import cmp_checksum

__all__ = ["BatchCompressor", "BatchDecompressor", "StagedFrames",
           "DecodedFrames"]


class BatchCompressor:
    """Compress sequences of (B, N) u16 frames on device, AIRSPACE-exact."""

    def __init__(self, params: CmpParams, batch: int, n_samples: int,
                 cmp_type: CmpType = CmpType.U16, adaptive: bool = False,
                 ladder: "tuple[int, ...] | None" = None):
        params.validate()
        if 2 * n_samples > (1 << 24) - 1:
            raise CmpError(CmpErrorCode.HDR_ORIGINAL_TOO_LARGE)
        self.params = params
        self.batch = batch
        self.n_samples = n_samples
        self.cmp_type = cmp_type
        self.adaptive = adaptive
        if adaptive:
            from ..ops.adapt import DEFAULT_LADDER
            from ..ops.encode import adaptive_cap_bits

            self.ladder = tuple(ladder) if ladder else DEFAULT_LADDER
            self._adaptive_cap = adaptive_cap_bits(
                make_pass_config(params, False, cmp_type is CmpType.U16),
                self.ladder)
        else:
            self.ladder = None
            self._adaptive_cap = None
        unsigned = cmp_type is CmpType.U16
        self.primary_cfg = make_pass_config(params, False, unsigned)
        self.secondary_cfg = (make_pass_config(params, True, unsigned)
                              if params.secondary_iterations else None)
        self.fallback_cfg = None
        if params.uncompressed_fallback_enabled:
            import dataclasses as _dc

            fb_params = _dc.replace(params, primary_preprocessing=Preprocessing.NONE,
                                    primary_encoder_type=0)
            self.fallback_cfg = make_pass_config(fb_params, False, unsigned)
        caps = [worst_case_words(self.primary_cfg, n_samples)]
        if self.secondary_cfg:
            caps.append(worst_case_words(self.secondary_cfg, n_samples))
        if self.adaptive:
            from ..ops.encode import adaptive_worst_case_words

            for c in (self.primary_cfg, self.secondary_cfg):
                if c is not None and c.enc_type in (1, 2):
                    caps.append(adaptive_worst_case_words(c, n_samples,
                                                          self.ladder))
        self.n_words = max(caps)
        # entropy-clamped Pallas packing (ops/pallas_pack.py): per-config
        # cap, dropped to None (sticky) if this stream's data overflows it
        from ..ops.encode import default_cap_bits

        self._cap_bits = {
            c: default_cap_bits(c)
            for c in (self.primary_cfg, self.secondary_cfg) if c is not None}
        # per-chain state (host side mirrors of reference cmp_context)
        self.seq = np.zeros(batch, dtype=np.int64)
        self.identifiers = np.zeros(batch, dtype=np.int64)
        self.model = jnp.zeros((batch, n_samples), jnp.int32)
        self._started = np.zeros(batch, dtype=bool)
        from ..utils.profiling import ThroughputMeter

        self.metrics = ThroughputMeter()

    # -- identifier bookkeeping (block order, like sequential C contexts) --
    def _draw_ids(self, mask: np.ndarray, draws_per_block: int = 1) -> None:
        for b in np.nonzero(mask)[0]:
            ident = 0
            for _ in range(draws_per_block):
                ident = _context._new_identifier()
            self.identifiers[b] = ident

    def reset(self) -> None:
        """Reset every chain (reference cmp_reset semantics per block)."""
        self.seq[:] = 0
        self._draw_ids(np.ones(self.batch, dtype=bool))
        self._started[:] = False

    # -- main entry ------------------------------------------------------
    def compress_frames(self, frames) -> "list[bytes]":
        """Compress one (B, N) frame per chain; returns B AIRSPACE frames.

        Input dtype follows the constructor's ``cmp_type`` (reference
        sample_reader.h:9-78): U16/I16 take (B, N) 16-bit samples;
        I16_IN_I32 takes (B, N) int32 words whose low 16 bits are the
        samples (upper halves ignored; ``original_size`` stays 2N — the
        *packed* size, sample_reader.h:75-78).
        """
        import time as _time

        _t0 = _time.perf_counter()
        if self.cmp_type is CmpType.I16_IN_I32:
            arr = np.asarray(frames)
            if arr.dtype.itemsize != 4:
                raise CmpError(CmpErrorCode.SRC_SIZE_WRONG,
                               "I16_IN_I32 input must be 32-bit words")
            x_np = np.ascontiguousarray(
                (arr & 0xFFFF).astype(np.uint16))
        else:
            x_np = np.ascontiguousarray(np.asarray(frames).astype(np.uint16))
        if x_np.shape != (self.batch, self.n_samples):
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG,
                           f"expected {(self.batch, self.n_samples)}, got {x_np.shape}")

        # pass selection per chain (cmp.c:228-248)
        primary_mask = (self.seq == 0) | (self.seq > self.params.secondary_iterations)
        # chains entering a primary pass reset: seq->0, fresh identifier
        self.seq[primary_mask] = 0
        self._draw_ids(primary_mask)

        x = jnp.asarray(x_np.view(np.int16), jnp.int32)
        seq_dev = jnp.asarray(self.seq.astype(np.int32))
        id_hi = jnp.asarray(((self.identifiers >> 24) & 0xFFFFFF).astype(np.uint32))
        id_lo = jnp.asarray((self.identifiers & 0xFFFFFF).astype(np.uint32))

        if self.params.checksum_enabled:
            from ..ops.xxh32_device import (
                checksum_blocks_device,
                use_device_checksum,
            )

            if use_device_checksum():
                # batch-parallel on device; the result feeds the encoder
                # without ever visiting the host (was: a sequential host
                # loop in the middle of the device pipeline)
                checksum = checksum_blocks_device(x)
            else:
                csums = np.fromiter(
                    (cmp_checksum(row) for row in x_np), dtype=np.uint32,
                    count=self.batch)
                checksum = jnp.asarray(csums)
        else:
            checksum = jnp.zeros((self.batch,), jnp.uint32)

        all_primary = bool(primary_mask.all())
        all_secondary = bool((~primary_mask).all())

        def run(cfg):
            if self.adaptive and cfg.enc_type in (1, 2):  # ZERO or MULTI
                from ..ops.encode import encode_blocks_adaptive

                cap = self._adaptive_cap
                if cap is not None:
                    w, s, fb, _g, ok = encode_blocks_adaptive(
                        cfg, self.fallback_cfg, x, self.model, seq_dev,
                        id_hi, id_lo, checksum, self.n_words, self.ladder,
                        cap_bits=cap)
                    if bool(np.asarray(jnp.all(ok))):
                        return w, s, fb
                    # sticky, like the fixed-rate path below
                    self._adaptive_cap = None
                w, s, fb, _g, _ok = encode_blocks_adaptive(
                    cfg, self.fallback_cfg, x, self.model, seq_dev, id_hi,
                    id_lo, checksum, self.n_words, self.ladder)
                return w, s, fb
            cap = self._cap_bits.get(cfg)
            if cap is not None:
                w, s, fb, ok = encode_blocks_device(
                    cfg, self.fallback_cfg, x, self.model, seq_dev, id_hi,
                    id_lo, checksum, self.n_words, cap_bits=cap)
                if bool(np.asarray(jnp.all(ok))):
                    return w, s, fb
                # entropy clamp overflowed for this data: re-encode at full
                # capacity and stop clamping this config (sticky — data
                # that overflowed once tends to keep doing it)
                self._cap_bits[cfg] = None
            return encode_blocks_device(cfg, self.fallback_cfg, x, self.model,
                                        seq_dev, id_hi, id_lo, checksum,
                                        self.n_words)

        if all_primary or self.secondary_cfg is None:
            words, sizes, fell_back = run(self.primary_cfg)
            used_cfg_rate = self.primary_cfg
        elif all_secondary:
            words, sizes, fell_back = run(self.secondary_cfg)
            used_cfg_rate = self.secondary_cfg
        else:
            w_p, s_p, f_p = run(self.primary_cfg)
            w_s, s_s, f_s = run(self.secondary_cfg)
            pm = jnp.asarray(primary_mask)
            words = jnp.where(pm[:, None], w_p, w_s)
            sizes = jnp.where(pm, s_p, s_s)
            fell_back = jnp.where(pm, f_p, f_s)
            used_cfg_rate = self.primary_cfg

        # model transition (only meaningful when the chain keeps a model)
        if self.params.model_is_needed():
            self.model = model_update_step(
                x, self.model, seq_dev, fell_back,
                self.params.model_rate,
                self.cmp_type is CmpType.U16)

        words_np = np.asarray(words)
        sizes_np = np.asarray(sizes)
        fell_np = np.asarray(fell_back)

        # sequence transitions: normal pass -> seq+1; fallback -> chain was
        # reset and the uncompressed pass ran at seq 0 -> next seq is 1
        self.seq = np.where(fell_np, 1, self.seq + 1)

        frames_out: list[bytes] = []
        be_bytes = words_np.astype(">u4").tobytes()
        stride = self.n_words * 4
        for b in range(self.batch):
            size = int(sizes_np[b])
            frame = bytearray(be_bytes[b * stride : b * stride + size])
            if fell_np[b]:
                # the reference draws two fresh identifiers on fallback
                # (generic reset + engine reset, cmp.c:380-392); patch the
                # header identifier accordingly
                ident = 0
                for _ in range(2):
                    ident = _context._new_identifier()
                self.identifiers[b] = ident
                frame[8:14] = int(ident).to_bytes(6, "big")
            frames_out.append(bytes(frame))
        self.metrics.record(x_np.nbytes, sum(map(len, frames_out)),
                            _time.perf_counter() - _t0)
        return frames_out


import dataclasses as _dataclasses


@jax.jit
def bswap32(w: jax.Array) -> jax.Array:
    """Byte-swap uint32 words (one fused VPU pass on device)."""
    w = w.astype(jnp.uint32)
    return ((w << jnp.uint32(24))
            | ((w & jnp.uint32(0xFF00)) << jnp.uint32(8))
            | ((w >> jnp.uint32(8)) & jnp.uint32(0xFF00))
            | (w >> jnp.uint32(24)))


@_dataclasses.dataclass
class StagedFrames:
    """Host-staged batch: parsed header columns + the padded word matrix.

    Produced by :meth:`BatchDecompressor.stage_frames`; everything here
    is validated numpy (no Python per-frame state), ready for one
    ``jnp.asarray`` upload.  ``words`` holds the frame bytes viewed as
    native uint32 — on a little-endian host these are byte-swapped
    relative to the stream's big-endian word values (``raw=True``) and
    :meth:`BatchDecompressor.decode_staged` swaps them ON DEVICE (one
    fused VPU pass; a host-side ``astype`` byteswap of the whole batch
    was a measurable share of wrapper decode time).
    """

    words: "np.ndarray"          # (B, n_words) uint32 (see ``raw``)
    raw: bool                    # True: device must byte-swap
    n_words: int
    prep: "np.ndarray"           # (B,) int32
    enc: "np.ndarray"            # (B,) int32
    cs: "np.ndarray"             # (B,) int32 0/1
    seq: "np.ndarray"            # (B,) int32
    g: "np.ndarray"              # (B,) uint32
    outlier: "np.ndarray"        # (B,) uint32
    csize: "np.ndarray"          # (B,) int64
    stored_csum: "np.ndarray"    # (B,) uint32 (0 where cs == 0)
    nbytes: int                  # total compressed input bytes


@_dataclasses.dataclass
class DecodedFrames:
    """Device-side decode result, integrity checks not yet applied.

    ``samples``/``end_bits``/``csum`` are device arrays; fetching them is
    the caller's (or :meth:`BatchDecompressor.finish`'s) choice, so a
    pipelined consumer can keep everything on device and defer the
    integrity fetch to a batch boundary.
    """

    samples: jax.Array           # (B, N) int32
    end_bits: jax.Array          # (B,) payload end bit position
    csum: "jax.Array | None"     # (B,) uint32 computed XXH32, or None


class BatchDecompressor:
    """Device decode of lockstep chains: B frames per call, model carried.

    Mirrors :class:`BatchCompressor` on the decode side.  The decode
    configuration of every block is taken from its parsed HEADER — the
    AIRSPACE header is self-describing (method byte at offset 15, per-
    block ``encoder_param``/``encoder_outlier`` in the extension,
    reference lib/common/header.c:89-134, header_private.h:23-31) — so
    all stream shapes decode correctly on device:

    * mixed primary/secondary batches (the state after a fallback reset
      one chain) decode under each method group present, selected per
      block;
    * uncompressed-fallback frames (NONE + UNCOMPRESSED) take a
      closed-form slice decode (ops.decode.decode_blocks_uncompressed);
    * adaptive streams (per-block Golomb parameter in the header,
      ops/adapt.py) decode in ONE device pass with per-lane parameters.

    Integrity contract (reference header.c:137-163): blocks whose method
    byte carries the checksum bit are verified against their trailing
    XXH32 with the batch-parallel device kernel
    (ops/xxh32_device.checksum_blocks_device); a mismatch raises
    ``CmpError`` exactly like the host decoder.  ``verify_checksum=False``
    opts out (same switch as the chunked tier).

    The generic per-block host decoder (engine/decode.py) remains the
    oracle for arbitrary streams.
    """

    def __init__(self, params: CmpParams, batch: int, n_samples: int,
                 cmp_type: CmpType = CmpType.U16,
                 verify_checksum: bool = True):
        params.validate()
        self.params = params
        self.batch = batch
        self.n_samples = n_samples
        self.cmp_type = cmp_type
        self.unsigned = cmp_type is CmpType.U16
        self.verify_checksum = verify_checksum
        self._expected_params_cache = None
        self.model = jnp.zeros((batch, n_samples), jnp.int32)
        from ..utils.profiling import ThroughputMeter

        self.metrics = ThroughputMeter()

    def _expected_enc_params(self) -> "set[tuple[int, int]]":
        """(g, outlier) pairs this decompressor's own params would emit."""
        if self._expected_params_cache is None:
            out = set()
            for cfg in (make_pass_config(self.params, False, self.unsigned),
                        make_pass_config(self.params, True, self.unsigned)
                        if self.params.secondary_iterations else None):
                if cfg is not None and cfg.enc_type != 0:
                    out.add((cfg.g_par, cfg.outlier))
            self._expected_params_cache = out
        return self._expected_params_cache

    def _group_cfg(self, prep: int, enc: int, cs: int, g_vals, o_vals):
        """Decode PassConfig for one header method group.

        Returns (cfg, g_dyn, outlier_dyn); the dynamic arrays are None
        when the group's parameters are uniform AND expected from this
        decompressor's own params (the common lockstep case — reuses the
        static-parameter compiled program).  Everything else — mixed
        parameters (adaptive streams) and uniform-but-unexpected values —
        takes the per-lane dynamic kernel with ``cfg.g_par`` bucketed to
        the next power of two, so the number of compiled programs is
        bounded by log2 of the parameter range, never by stream content
        (a stream with adversarial headers must not be able to force one
        fresh XLA compile per header value — found by the fuzz soak,
        which ran the process out of JIT code memory that way; the
        dynamic kernel benches within ~2% of the static one).
        """
        from ..ops.encode import PassConfig

        if enc == 0:
            cfg = PassConfig(prep, 0, 0, 0, bool(cs),
                             self.params.model_rate, prep == 3,
                             self.unsigned)
            return cfg, None, None
        uniform = (g_vals.min() == g_vals.max()
                   and o_vals.min() == o_vals.max())
        if uniform and (int(g_vals[0]),
                        int(o_vals[0])) in self._expected_enc_params():
            cfg = PassConfig(prep, enc, int(g_vals[0]), int(o_vals[0]),
                             bool(cs), self.params.model_rate, prep == 3,
                             self.unsigned)
            return cfg, None, None
        g_cap = 1 << max(int(g_vals.max()) - 1, 0).bit_length()
        cfg = PassConfig(prep, enc, g_cap, 0, bool(cs),
                         self.params.model_rate, prep == 3, self.unsigned)
        return cfg, g_vals, o_vals

    # -- staging (host, vectorized) --------------------------------------
    def stage_frames(self, frames: "list[bytes]") -> StagedFrames:
        """Parse + validate B frames into one padded word matrix.

        All per-frame work is vectorized numpy (one ``b"".join`` memcpy
        when frame lengths are uniform — the common lockstep case); the
        validation matrix reproduces the host decoder's per-frame check
        order exactly (first offending block raises its first failing
        check).
        """
        from ..format.header import (
            CMP_HDR_MAX_SIZE,
            CMP_HDR_SIZE,
            parse_headers_batch,
        )

        if len(frames) != self.batch:
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG)
        B = self.batch
        lens = np.fromiter((len(f) for f in frames), np.int64, count=B)
        n_words, stride = self._staging_geometry(lens)
        buf = np.zeros((B, stride), np.uint8)
        max_len = int(lens.max()) if B else 0
        if (lens == max_len).all():
            buf[:, :max_len] = np.frombuffer(
                b"".join(frames), np.uint8).reshape(B, max_len)
        else:
            from .. import native

            if native.native_available():
                # one join memcpy + one C row scatter (the per-row
                # Python loop was the wrapper's dominant host cost)
                native.scatter_rows(b"".join(frames), lens, stride, buf)
            else:
                for b, f in enumerate(frames):
                    buf[b, : lens[b]] = np.frombuffer(f, np.uint8)
        return self._stage_from_buf(buf, lens, n_words)

    def stage_frames_at(self, stream: bytes, offsets, lens) -> StagedFrames:
        """Stage B frames that live inside ONE contiguous buffer.

        The concatenated-stream (file) decode path: blocks are located by
        (offset, length) pairs and staged straight from ``stream`` with
        one C scatter — no per-block slices, no re-join.  Same
        validation/parse path as :meth:`stage_frames`.
        """
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        lens = np.ascontiguousarray(lens, dtype=np.int64)
        if lens.size != self.batch or offsets.size != self.batch:
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG)
        if (offsets < 0).any() or (lens < 0).any() or (
                offsets + lens > len(stream)).any():
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG,
                           "frame spans exceed the stream buffer")
        n_words, stride = self._staging_geometry(lens)
        buf = np.zeros((self.batch, stride), np.uint8)
        from .. import native

        if native.native_available():
            native.scatter_rows_at(stream, offsets, lens, stride, buf)
        else:
            sv = np.frombuffer(stream, np.uint8)
            for b in range(self.batch):
                buf[b, : lens[b]] = sv[offsets[b] : offsets[b] + lens[b]]
        return self._stage_from_buf(buf, lens, n_words)

    @staticmethod
    def _staging_geometry(lens: "np.ndarray") -> "tuple[int, int]":
        max_len = int(lens.max()) if lens.size else 0
        n_words = (max_len + 3) // 4 + 2
        # bucket the buffer width so repeated calls with slightly
        # different frame sizes reuse one compiled decode program; the
        # floor keeps stride >= CMP_HDR_MAX_SIZE so the vectorized
        # header parse is in bounds even when EVERY frame is truncated
        # (those batches must raise CmpError, not IndexError)
        n_words = 1 << max((n_words - 1).bit_length(), 3)
        return n_words, n_words * 4

    def _stage_from_buf(self, buf: "np.ndarray", lens: "np.ndarray",
                        n_words: int) -> StagedFrames:
        from ..format.header import (
            CMP_HDR_MAX_SIZE,
            CMP_HDR_SIZE,
            parse_headers_batch,
        )

        B = self.batch
        stride = n_words * 4
        h = parse_headers_batch(buf)
        # validation, same per-frame order as CmpHeader.deserialize + the
        # host decoder's guards: for each frame the FIRST failing check
        # wins; the first failing frame raises
        checks = (
            (lens < CMP_HDR_SIZE,
             CmpErrorCode.INT_HDR, "header truncated"),
            (h.has_extension & (lens < CMP_HDR_MAX_SIZE),
             CmpErrorCode.INT_HDR, "extended header truncated"),
            (lens < h.compressed_size,
             CmpErrorCode.INT_HDR,
             "frame shorter than header compressed_size"),
            (h.original_size != 2 * self.n_samples,
             CmpErrorCode.SRC_SIZE_MISMATCH, None),
            ((h.preprocessing > 3) | (h.encoder_type > 2),
             CmpErrorCode.INT_HDR, "unknown method"),
            ((h.encoder_type != 0)
             & ~((1 <= h.encoder_param) & (h.encoder_param <= 0xFFFF)),
             CmpErrorCode.PARAMS_INVALID,
             "bad Golomb parameter in header"),
            # MODEL preprocessing needs prior chain state; no encoder
            # emits it on a primary pass (reference cmp.c:228-254 — the
            # seq-0 pass reseeds the model instead), so a seq-0 MODEL
            # header is corrupt (same rule as the chunked host path)
            ((h.preprocessing == 3) & (h.sequence_number == 0),
             CmpErrorCode.INT_HDR,
             "MODEL preprocessing on a primary pass"),
        )
        fail_rank = np.full(B, len(checks), np.int64)
        for rank, (bad, _, _) in reversed(list(enumerate(checks))):
            fail_rank = np.where(bad, rank, fail_rank)
        bad_blocks = np.nonzero(fail_rank < len(checks))[0]
        if bad_blocks.size:
            b = int(bad_blocks[0])
            _, code, msg = checks[int(fail_rank[b])]
            raise CmpError(code, None if msg is None
                           else f"block {b}: {msg}")

        # trailing stored checksum bytes (BE u32 at compressed_size - 4)
        idx = np.clip(h.compressed_size[:, None] - 4
                      + np.arange(4)[None, :], 0, stride - 1)
        tb = np.take_along_axis(buf, idx, axis=1).astype(np.uint32)
        stored = ((tb[:, 0] << 24) | (tb[:, 1] << 16)
                  | (tb[:, 2] << 8) | tb[:, 3])
        stored = np.where(h.checksum_enabled != 0, stored, 0)

        import sys as _sys

        # on a little-endian host the raw u32 view is byte-swapped
        # relative to the stream's BE word values; the device swaps
        return StagedFrames(
            words=buf.view(np.uint32), raw=_sys.byteorder == "little",
            n_words=n_words,
            prep=h.preprocessing, enc=h.encoder_type,
            cs=h.checksum_enabled, seq=h.sequence_number,
            g=h.encoder_param, outlier=h.encoder_outlier,
            csize=h.compressed_size, stored_csum=stored.astype(np.uint32),
            nbytes=int(lens.sum()))

    # -- device decode ----------------------------------------------------
    def decode_staged(self, st: StagedFrames,
                      words_dev: "jax.Array | None" = None) -> DecodedFrames:
        """Run the device decode passes for a staged batch.

        ``words_dev`` lets a caller reuse an already-uploaded word matrix
        (``st.words`` verbatim — the byte swap, when pending, happens
        here on device); everything returned stays on device — no host
        sync happens here.
        """
        from ..ops.decode import (
            decode_blocks_device,
            decode_blocks_uncompressed,
        )

        if words_dev is None:
            words_dev = jnp.asarray(st.words)
        if st.raw:
            words_dev = bswap32(words_dev)

        # header-driven dispatch: one device pass per method group present
        key = (st.prep.astype(np.int64) * 16 + st.enc * 2 + st.cs)
        samples = None
        end_bits = None
        for k in np.unique(key):
            mask = key == k
            prep, enc, cs = int(k) // 16, (int(k) // 2) % 8, int(k) % 2
            if prep == 0 and enc == 0:
                s = decode_blocks_uncompressed(words_dev, self.n_samples)
                e = jnp.full((self.batch,), 128 + 16 * self.n_samples,
                             jnp.int32)
            else:
                cfg, g_dyn, o_dyn = self._group_cfg(
                    prep, enc, cs, st.g[mask], st.outlier[mask])
                if g_dyn is not None:
                    # full-batch per-lane parameters (masked lanes decode
                    # garbage, discarded by the select below)
                    s, e = decode_blocks_device(
                        cfg, words_dev, self.model, self.n_samples,
                        g_dyn=jnp.asarray(np.where(mask, st.g, 1)),
                        outlier_dyn=jnp.asarray(np.where(mask, st.outlier,
                                                         1)))
                else:
                    s, e = decode_blocks_device(
                        cfg, words_dev, self.model, self.n_samples)
            if samples is None:
                samples, end_bits = s, e
            else:
                m = jnp.asarray(mask)
                samples = jnp.where(m[:, None], s, samples)
                end_bits = jnp.where(m, e.astype(end_bits.dtype), end_bits)

        csum = None
        if self.verify_checksum and (st.cs != 0).any():
            from ..ops.xxh32_device import (
                checksum_blocks_device,
                use_device_checksum,
            )

            if use_device_checksum():
                csum = checksum_blocks_device(samples)
            # else: finish() verifies on host with the native xxhash
            # fast path once the samples are fetched (the routing
            # predicate use_device_checksum governs every tier)
        return DecodedFrames(samples=samples, end_bits=end_bits, csum=csum)

    # -- integrity + state transition -------------------------------------
    def finish(self, st: StagedFrames, dec: DecodedFrames) -> np.ndarray:
        """Verify integrity, advance the model chain, fetch the samples."""
        fetch = [dec.end_bits]
        if dec.csum is not None:
            fetch.append(dec.csum)
        fetched = jax.device_get(fetch)
        end_np = np.asarray(fetched[0], np.int64)

        # bitstream-exhaustion check, mirroring the host decoder's
        # "payload exceeds compressed_size" guard (engine/host.py): a
        # corrupt payload must raise, never silently return garbage
        limit = st.csize - np.where(st.cs != 0, 4, 0)
        over = np.nonzero((end_np + 7) // 8 > limit)[0]
        if over.size:
            raise CmpError(
                CmpErrorCode.INT_BITSTREAM,
                f"block {int(over[0])}: payload exceeds compressed_size")

        # XXH32 trailer enforcement (reference header.c:137-163: the
        # checksum bit is part of the block contract; the host and
        # chunked tiers already raise on mismatch — so does this one).
        # decode_staged computed the checksums on device when the
        # backend routing allows; otherwise verify here on host with the
        # native xxhash fast path over the fetched samples.
        out = np.asarray(dec.samples).astype(np.int32).astype(np.uint16)
        if dec.csum is not None:
            calc = np.asarray(fetched[1], np.uint64)
            bad = np.nonzero((st.cs != 0)
                             & (calc != st.stored_csum.astype(np.uint64)))[0]
        elif self.verify_checksum and (st.cs != 0).any():
            calc = np.fromiter(
                (cmp_checksum(out[b]) if st.cs[b] else 0
                 for b in range(self.batch)),
                np.uint64, count=self.batch)
            bad = np.nonzero((st.cs != 0)
                             & (calc != st.stored_csum.astype(np.uint64)))[0]
        else:
            bad = np.empty(0, np.int64)
        if bad.size:
            b = int(bad[0])
            raise CmpError(
                CmpErrorCode.GENERIC,
                f"block {b}: checksum mismatch: stored "
                f"{int(st.stored_csum[b]):#010x} != computed "
                f"{int(calc[b]):#010x}")

        # model transition identical to the encoder's: per-block seq;
        # fallback frames carry seq 0, which reseeds the model exactly as
        # the encoder's fallback reseed does (cmp.c:380-392 + :304-311)
        if self.params.model_is_needed():
            self.model = model_update_step(
                dec.samples, self.model, jnp.asarray(st.seq),
                jnp.zeros((self.batch,), bool),
                self.params.model_rate, self.cmp_type is CmpType.U16)
        return out

    def decompress_frames(self, frames: "list[bytes]") -> np.ndarray:
        """Decode one AIRSPACE frame per chain -> (B, N) uint16 samples."""
        import time as _time

        _t0 = _time.perf_counter()
        st = self.stage_frames(frames)
        dec = self.decode_staged(st)
        out = self.finish(st, dec)
        self.metrics.record(st.nbytes, out.nbytes,
                            _time.perf_counter() - _t0)
        return out
