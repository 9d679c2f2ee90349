"""Input sample-type adapters.

Mirrors the reference sample reader (lib/common/sample_reader.h:9-78): three
accepted input layouts, all yielding a stream of 16-bit samples:

* ``I16``  — contiguous ``int16`` (stride 2)
* ``U16``  — contiguous ``uint16`` (stride 2); bytes are reinterpreted as
  ``int16`` for preprocessing/encoding, but model updates treat values as
  unsigned (reference cmp.c:132-142)
* ``I16_IN_I32`` — 16-bit samples in the low half of ``int32`` words
  (stride 4, upper 16 bits ignored)

``packed_size`` is always ``num_samples * 2`` regardless of input stride
(reference sample_reader.h:75-78) — this is what the header's
``original_size`` records.
"""

from __future__ import annotations

import enum

import numpy as np

from .errors import CmpError, CmpErrorCode

__all__ = ["CmpType", "SampleView"]


class CmpType(enum.IntEnum):
    """Sample input layouts (reference sample_reader.h:9)."""

    I16 = 0
    I16_IN_I32 = 1
    U16 = 2

    @property
    def stride(self) -> int:
        return 4 if self is CmpType.I16_IN_I32 else 2


class SampleView:
    """Typed view over an input buffer, 16-bit samples extracted.

    ``samples_i16`` holds every sample reinterpreted as ``int16`` (the
    representation used by preprocessing and encoding, reference
    sample_reader.h:63-72); ``packed_size`` is ``2 * num_samples``.
    """

    def __init__(self, data, cmp_type: CmpType):
        if data is None:
            raise CmpError(CmpErrorCode.SRC_NULL)
        arr = np.asarray(data)
        src_size = arr.nbytes
        if src_size == 0:
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG)
        if src_size % cmp_type.stride != 0:
            raise CmpError(CmpErrorCode.SRC_SIZE_WRONG)

        raw = arr.reshape(-1).view(np.uint8)
        if cmp_type is CmpType.I16_IN_I32:
            words = raw.view(np.uint32)
            self.samples_i16 = (words & 0xFFFF).astype(np.uint16).view(np.int16)
        else:
            self.samples_i16 = raw.view(np.int16).copy()
        self.type = cmp_type
        self.num_samples = int(self.samples_i16.size)
        self.src_size = src_size

    @property
    def packed_size(self) -> int:
        """Reference get_packed_size (sample_reader.h:75-78)."""
        return self.num_samples * 2

    @property
    def samples_u16(self) -> np.ndarray:
        return self.samples_i16.view(np.uint16)
