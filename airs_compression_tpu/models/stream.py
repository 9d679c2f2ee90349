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
  * XXH32 checksums of the raw frames (optional; sequential algorithm,
    computed with the native xxhash fast path);
  * slicing the device's fixed-capacity word buffers into per-frame bytes.

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

__all__ = ["BatchCompressor", "BatchDecompressor"]


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

            self.ladder = tuple(ladder) if ladder else DEFAULT_LADDER
        else:
            self.ladder = None
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

                w, s, fb, _g = encode_blocks_adaptive(
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

    The generic per-block host decoder (engine/decode.py) remains the
    oracle for arbitrary streams.
    """

    def __init__(self, params: CmpParams, batch: int, n_samples: int,
                 cmp_type: CmpType = CmpType.U16):
        params.validate()
        self.params = params
        self.batch = batch
        self.n_samples = n_samples
        self.cmp_type = cmp_type
        self.unsigned = cmp_type is CmpType.U16
        self.model = jnp.zeros((batch, n_samples), jnp.int32)
        from ..utils.profiling import ThroughputMeter

        self.metrics = ThroughputMeter()

    def _group_cfg(self, prep: int, enc: int, cs: int, g_vals, o_vals):
        """Decode PassConfig for one header method group.

        Returns (cfg, g_dyn, outlier_dyn); the dynamic arrays are None
        when the group's parameters are uniform (the common, fastest
        case — reuses the static-parameter compiled program).  For mixed
        parameters (adaptive streams), ``cfg.g_par`` is bucketed to the
        next power of two above the lane maximum, so recompiles are
        bounded by log2 of the ladder span, not by data content.
        """
        from ..ops.encode import PassConfig

        if enc == 0:
            cfg = PassConfig(prep, 0, 0, 0, bool(cs),
                             self.params.model_rate, prep == 3,
                             self.unsigned)
            return cfg, None, None
        uniform = (g_vals.min() == g_vals.max()
                   and o_vals.min() == o_vals.max())
        if uniform:
            cfg = PassConfig(prep, enc, int(g_vals[0]), int(o_vals[0]),
                             bool(cs), self.params.model_rate, prep == 3,
                             self.unsigned)
            return cfg, None, None
        g_cap = 1 << max(int(g_vals.max()) - 1, 0).bit_length()
        cfg = PassConfig(prep, enc, g_cap, 0, bool(cs),
                         self.params.model_rate, prep == 3, self.unsigned)
        return cfg, g_vals, o_vals

    def decompress_frames(self, frames: "list[bytes]") -> np.ndarray:
        """Decode one AIRSPACE frame per chain -> (B, N) uint16 samples."""
        import time as _time

        from ..format.header import CmpHeader
        from ..ops.decode import (
            decode_blocks_device,
            decode_blocks_uncompressed,
        )

        _t0 = _time.perf_counter()
        if len(frames) != self.batch:
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG)
        hdrs = []
        for f in frames:
            h, _ = CmpHeader.deserialize(f)
            if len(f) < h.compressed_size:
                raise CmpError(CmpErrorCode.INT_HDR,
                               "frame shorter than header compressed_size")
            if h.original_size != 2 * self.n_samples:
                raise CmpError(CmpErrorCode.SRC_SIZE_MISMATCH)
            if h.preprocessing > 3 or h.encoder_type > 2:
                raise CmpError(CmpErrorCode.INT_HDR,
                               f"unknown method {h.preprocessing}/"
                               f"{h.encoder_type}")
            if h.encoder_type != 0 and not (1 <= h.encoder_param <= 0xFFFF):
                # same guard as the host decoder (engine/host.py): a
                # zero/overflowing Golomb parameter is a corrupt header
                raise CmpError(CmpErrorCode.PARAMS_INVALID,
                               "bad Golomb parameter in header")
            hdrs.append(h)
        seq_np = np.asarray([h.sequence_number for h in hdrs], np.int32)
        g_np = np.asarray([h.encoder_param for h in hdrs], np.uint32)
        o_np = np.asarray([h.encoder_outlier for h in hdrs], np.uint32)
        n_words = max((len(f) + 3) // 4 for f in frames) + 2
        # bucket the buffer width so repeated calls with slightly
        # different frame sizes reuse one compiled decode program
        n_words = 1 << (n_words - 1).bit_length()
        words = np.zeros((self.batch, n_words), dtype=np.uint32)
        for b, f in enumerate(frames):
            padded = f + b"\x00" * ((-len(f)) % 4)
            words[b, : len(padded) // 4] = np.frombuffer(padded, dtype=">u4")
        words_dev = jnp.asarray(words)

        # header-driven dispatch: one device pass per method group present
        groups: "dict[tuple[int, int, int], np.ndarray]" = {}
        for i, h in enumerate(hdrs):
            key = (h.preprocessing, h.encoder_type, h.checksum_enabled)
            groups.setdefault(key, np.zeros(self.batch, bool))[i] = True
        samples = None
        end_bits = np.zeros(self.batch, np.int64)
        for (prep, enc, cs), mask in groups.items():
            if prep == 0 and enc == 0:
                s = decode_blocks_uncompressed(words_dev, self.n_samples)
                end_bits[mask] = 128 + 16 * self.n_samples
            else:
                cfg, g_dyn, o_dyn = self._group_cfg(
                    prep, enc, cs, g_np[mask], o_np[mask])
                if g_dyn is not None:
                    # full-batch per-lane parameters (masked lanes decode
                    # garbage, discarded by the select below)
                    s, e = decode_blocks_device(
                        cfg, words_dev, self.model, self.n_samples,
                        g_dyn=jnp.asarray(np.where(mask, g_np, 1)),
                        outlier_dyn=jnp.asarray(np.where(mask, o_np, 1)))
                else:
                    s, e = decode_blocks_device(
                        cfg, words_dev, self.model, self.n_samples)
                end_bits[mask] = np.asarray(e)[mask]
            if samples is None:
                samples = s
            else:
                samples = jnp.where(jnp.asarray(mask)[:, None], s, samples)

        # bitstream-exhaustion check, mirroring the host decoder's
        # "payload exceeds compressed_size" guard (engine/host.py): a
        # corrupt payload must raise, never silently return garbage
        for b, h in enumerate(hdrs):
            limit = h.compressed_size - (4 if h.checksum_enabled else 0)
            if (int(end_bits[b]) + 7) // 8 > limit:
                raise CmpError(
                    CmpErrorCode.INT_BITSTREAM,
                    f"block {b}: payload exceeds compressed_size")

        # model transition identical to the encoder's: per-block seq;
        # fallback frames carry seq 0, which reseeds the model exactly as
        # the encoder's fallback reseed does (cmp.c:380-392 + :304-311)
        if self.params.model_is_needed():
            self.model = model_update_step(
                samples, self.model, jnp.asarray(seq_np),
                jnp.zeros((self.batch,), bool),
                self.params.model_rate, self.cmp_type is CmpType.U16)
        out = np.asarray(samples).astype(np.int32).astype(np.uint16)
        self.metrics.record(sum(map(len, frames)), out.nbytes,
                            _time.perf_counter() - _t0)
        return out
