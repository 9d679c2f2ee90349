"""Compression context: lifecycle, pass selection, fallback orchestration.

Mirrors the reference context machinery exactly (lib/compress/cmp.c:152-473):

* ``cmp_initialise``  -> :class:`CmpContext` construction (validation order,
  work-buffer sizing rules, 8-bit sequence-number limit)
* pass selection      -> sequence_number 0 or > secondary_iterations resets
  the chain and uses primary parameters; otherwise secondary parameters
  (cmp.c:228-248), with the model-size-change guard
* ``cmp_reset``       -> :meth:`CmpContext.reset` (new 48-bit identifier
  drawn from the timestamp function, sequence number back to 0)
* uncompressed fallback -> :meth:`_compress_generic` replicates the
  probe-with-clamped-capacity / reset / re-run-uncompressed dance
  (cmp.c:342-393), including the number of identifier draws
* ``cmp_set_timestamp_func`` -> :func:`set_timestamp_func` with the same
  fallback monotonic counter (cmp.c:27-50)

Compression itself is delegated per frame to the host codec
(engine/host.py) or, for batched device execution, to ops/encode.py via
:mod:`airs_compression_tpu.models.stream`.
"""

from __future__ import annotations

import threading

import numpy as np

from ..format.dtypes import CmpType, SampleView
from ..format.errors import CmpError, CmpErrorCode
from ..format.header import CMP_CHECKSUM_SIZE, CMP_HDR_SIZE
from ..format.params import (
    CmpParams,
    EncoderType,
    Preprocessing,
    cal_work_buf_size,
)
from .host import PassResult, compress_pass_host

__all__ = ["CmpContext", "set_timestamp_func"]


class _FallbackTimestamp:
    """Monotonic counter timestamp source (reference cmp.c:27-34)."""

    def __init__(self) -> None:
        self._cnt = 0
        self._lock = threading.Lock()

    def __call__(self) -> "tuple[int, int]":
        with self._lock:
            cnt = self._cnt
            self._cnt += 1
        return (cnt >> 16) & 0xFFFFFFFF, cnt & 0xFFFF


_fallback_timestamp = _FallbackTimestamp()
_timestamp_func = _fallback_timestamp


def set_timestamp_func(func) -> None:
    """Install a custom ``() -> (coarse_u32, fine_u16)`` timestamp source.

    Mirrors reference cmp_set_timestamp_func (cmp.c:44-50); ``None``
    restores the internal monotonic counter.
    """
    global _timestamp_func
    _timestamp_func = func if func is not None else _fallback_timestamp


def _new_identifier() -> int:
    """48-bit identifier from the timestamp source (reference cmp.c:438-449)."""
    coarse, fine = _timestamp_func()
    return (((coarse & 0xFFFFFFFF) << 16) | (fine & 0xFFFF)) & ((1 << 48) - 1)


def _new_identifiers(k: int) -> "np.ndarray":
    """k sequential identifier draws as one (k,) uint64 array.

    Byte-for-byte equal to k :func:`_new_identifier` calls (the batch
    encoder draws one per block in block order, like B sequential
    reference contexts).  With the internal monotonic counter the k
    counts are reserved in one locked step — ((cnt >> 16) << 16) | (cnt
    & 0xFFFF) == cnt for cnt < 2^48, so the identifiers are just the
    counter values; a custom timestamp source is called k times.
    """
    if _timestamp_func is _fallback_timestamp:
        with _fallback_timestamp._lock:
            base = _fallback_timestamp._cnt
            _fallback_timestamp._cnt += k
        return ((base + np.arange(k, dtype=np.uint64))
                & np.uint64((1 << 48) - 1))
    return np.fromiter((_new_identifier() for _ in range(k)), np.uint64,
                       count=k)


class CmpContext:
    """Stateful compression context (reference struct cmp_context + API).

    Unlike the C library the work buffer is managed internally: the model
    state lives in a NumPy int16 array sized on first use.  Multi-pass
    chains behave identically: the first pass (sequence 0) uses primary
    parameters and seeds the model; passes 1..secondary_iterations use
    secondary parameters; the chain then wraps back to a primary pass.
    """

    def __init__(self, params: CmpParams):
        if params is None:
            raise CmpError(CmpErrorCode.GENERIC)
        params.validate()
        self.params = params
        self._model: np.ndarray | None = None
        self._model_size = 0  # packed bytes, like ctx->model_size
        self.sequence_number = 0
        self.identifier = 0
        self._initialised = True
        self.reset()

    # -- lifecycle -------------------------------------------------------
    def reset(self) -> None:
        """Restart the compression series (reference cmp_reset, cmp.c:452-465)."""
        if not self._initialised:
            raise CmpError(CmpErrorCode.CONTEXT_INVALID)
        self.sequence_number = 0
        self.identifier = _new_identifier()
        self._model_size = 0

    def deinitialise(self) -> None:
        """End the context's lifetime (reference cmp_deinitialise)."""
        self._initialised = False
        self._model = None

    # -- compression entry points (reference cmp_compress_*) -------------
    def compress_u16(self, src, dst_capacity: int | None = None) -> bytes:
        return self._compress(src, CmpType.U16, dst_capacity)

    def compress_i16(self, src, dst_capacity: int | None = None) -> bytes:
        return self._compress(src, CmpType.I16, dst_capacity)

    def compress_i16_in_i32(self, src, dst_capacity: int | None = None) -> bytes:
        return self._compress(src, CmpType.I16_IN_I32, dst_capacity)

    def compress(self, src, cmp_type: CmpType = CmpType.U16,
                 dst_capacity: int | None = None) -> bytes:
        return self._compress(src, cmp_type, dst_capacity)

    # -- internals -------------------------------------------------------
    def _compress(self, src, cmp_type: CmpType, dst_capacity: int | None) -> bytes:
        if not self._initialised:
            raise CmpError(CmpErrorCode.CONTEXT_INVALID)
        view = SampleView(src, cmp_type)
        if dst_capacity is None:
            from ..format.params import compress_bound

            dst_capacity = compress_bound(view.packed_size)
        result = self._compress_generic(view, dst_capacity)
        if result.error != CmpErrorCode.NO_ERROR:
            raise CmpError(result.error)
        assert result.compressed is not None
        return result.compressed

    def _engine(self, view: SampleView, dst_capacity: int) -> PassResult:
        """Pass selection + one engine pass (reference compress_engine)."""
        if (self.sequence_number == 0
                or self.sequence_number > self.params.secondary_iterations):
            self.reset()
            secondary = False
            self._model_size = view.packed_size
        else:
            secondary = True
            if (self.params.model_is_needed()
                    and view.packed_size != self._model_size):
                return PassResult(None, CmpErrorCode.SRC_SIZE_MISMATCH, 0)

        model = None
        if self.params.model_is_needed():
            model = self._ensure_model(view.num_samples)

        result = compress_pass_host(self.params, secondary, view, model,
                                    self.sequence_number, self.identifier,
                                    dst_capacity)
        if result.error == CmpErrorCode.NO_ERROR:
            self.sequence_number += 1
        return result

    def _ensure_model(self, num_samples: int) -> np.ndarray:
        if self._model is None or self._model.size < num_samples:
            new = np.zeros(num_samples, dtype=np.int16)
            if self._model is not None:
                new[: self._model.size] = self._model
            self._model = new
        return self._model[:num_samples]

    def _compress_generic(self, view: SampleView, dst_capacity: int) -> PassResult:
        """Uncompressed fallback orchestration (reference cmp.c:342-393)."""
        uncompressed_size = CMP_HDR_SIZE + view.packed_size
        if self.params.checksum_enabled:
            uncompressed_size += CMP_CHECKSUM_SIZE

        if (not self.params.uncompressed_fallback_enabled
                or dst_capacity < uncompressed_size):
            return self._engine(view, dst_capacity)

        # Probe with capacity clamped to the uncompressed size; a
        # DST_TOO_SMALL failure means compression is ineffective.
        result = self._engine(view, uncompressed_size)
        if result.error != CmpErrorCode.DST_TOO_SMALL:
            return result

        # Fall back: reset the chain (fresh identifier), temporarily force
        # NONE + UNCOMPRESSED primary parameters, re-run.
        self.reset()
        saved = self.params
        import dataclasses as _dc

        self.params = _dc.replace(
            saved,
            primary_preprocessing=Preprocessing.NONE,
            primary_encoder_type=EncoderType.UNCOMPRESSED,
        )
        try:
            result = self._engine(view, uncompressed_size)
        finally:
            self.params = saved
        return result

    # -- introspection ---------------------------------------------------
    @property
    def model(self) -> np.ndarray | None:
        """Current model state (int16), or None if unused."""
        return self._model

    def work_buf_size(self, src_size: int) -> int:
        return cal_work_buf_size(self.params, src_size)
