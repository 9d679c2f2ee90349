"""AIRSPACE compression header: constants and host-side (de)serialization.

Byte/bit layout follows the reference format spec "ARIEL-UVIE-PL-TN-004
Issue 0.2" as implemented by the reference encoder (lib/cmp_header.h:26-58,
lib/common/header_private.h:23-42, lib/common/header.c:24-134):

    offset  bits  field
    0       1     version flag (1 = has version id)
    0.125   15    version id
    2       24    compressed size (header + payload + optional checksum)
    5       24    original (packed) size
    8       48    identifier (timestamp)
    14      8     sequence number
    15      4     preprocessing | 1 checksum-enabled | 3 encoder type
    --- extended header, present iff preprocessing != NONE or encoder != UNCOMPRESSED
    16      8     model adaptation rate
    17      16    encoder parameter
    19      24    encoder outlier

The header is always a whole number of bytes (16, or 22 with the extension),
so host-side byte (de)serialization is exact.  The on-device encoder builds
the same bytes inside the packed word stream (see ops/bitpack.py).
"""

from __future__ import annotations

import dataclasses

from .errors import CmpError, CmpErrorCode

__all__ = [
    "CMP_HDR_SIZE",
    "CMP_EXT_HDR_SIZE",
    "CMP_HDR_MAX_SIZE",
    "CMP_CHECKSUM_SIZE",
    "CMP_HDR_MAX_COMPRESSED_SIZE",
    "CMP_HDR_MAX_ORIGINAL_SIZE",
    "CMP_HDR_BITS_SEQUENCE_NUMBER",
    "CMP_HDR_BITS_IDENTIFIER",
    "CMP_VERSION_NUMBER",
    "CMP_VERSION_STRING",
    "CHECKSUM_SEED",
    "CmpHeader",
    "HeaderBatch",
    "parse_headers_batch",
]

# Sizes (bytes)
CMP_HDR_SIZE = 16
CMP_EXT_HDR_SIZE = 6
CMP_HDR_MAX_SIZE = CMP_HDR_SIZE + CMP_EXT_HDR_SIZE
CMP_CHECKSUM_SIZE = 4

# Field widths (bits)
CMP_HDR_BITS_VERSION_FLAG = 1
CMP_HDR_BITS_VERSION_ID = 15
CMP_HDR_BITS_COMPRESSED_SIZE = 24
CMP_HDR_BITS_ORIGINAL_SIZE = 24
CMP_HDR_BITS_IDENTIFIER = 48
CMP_HDR_BITS_SEQUENCE_NUMBER = 8

CMP_HDR_MAX_COMPRESSED_SIZE = (1 << CMP_HDR_BITS_COMPRESSED_SIZE) - 1
CMP_HDR_MAX_ORIGINAL_SIZE = (1 << CMP_HDR_BITS_ORIGINAL_SIZE) - 1

# Version of the reference format we are bit-compatible with
# (reference lib/cmp.h:39-47: major*10000 + minor*100 + release).
CMP_VERSION_MAJOR = 0
CMP_VERSION_MINOR = 6
CMP_VERSION_RELEASE = 0
CMP_VERSION_NUMBER = (
    CMP_VERSION_MAJOR * 100 * 100 + CMP_VERSION_MINOR * 100 + CMP_VERSION_RELEASE
)
CMP_VERSION_STRING = f"{CMP_VERSION_MAJOR}.{CMP_VERSION_MINOR}.{CMP_VERSION_RELEASE}"

# XXH32 seed for the optional trailing checksum
# (reference lib/common/header_private.h:46).
CHECKSUM_SEED = 419764627


@dataclasses.dataclass
class CmpHeader:
    """In-memory view of a compression header (reference struct cmp_hdr)."""

    version_flag: int = 1
    version_id: int = CMP_VERSION_NUMBER
    compressed_size: int = 0
    original_size: int = 0
    identifier: int = 0
    sequence_number: int = 0

    preprocessing: int = 0  # enum Preprocessing value
    checksum_enabled: int = 0
    encoder_type: int = 0  # enum EncoderType value

    # Extended fields (meaningful only when the extension is present)
    model_rate: int = 0
    encoder_param: int = 0
    encoder_outlier: int = 0

    @property
    def has_extension(self) -> bool:
        """Extension present iff preprocessing != NONE or encoder != UNCOMPRESSED
        (reference lib/common/header.c:55-60)."""
        return self.preprocessing != 0 or self.encoder_type != 0

    @property
    def size(self) -> int:
        return CMP_HDR_SIZE + (CMP_EXT_HDR_SIZE if self.has_extension else 0)

    def serialize(self) -> bytes:
        """Produce the on-wire header bytes (reference header.c:24-67)."""
        if self.compressed_size > CMP_HDR_MAX_COMPRESSED_SIZE:
            raise CmpError(CmpErrorCode.HDR_CMP_SIZE_TOO_LARGE)
        if self.original_size > CMP_HDR_MAX_ORIGINAL_SIZE:
            raise CmpError(CmpErrorCode.HDR_ORIGINAL_TOO_LARGE)

        version = ((self.version_flag & 1) << CMP_HDR_BITS_VERSION_ID) | (
            self.version_id & ((1 << CMP_HDR_BITS_VERSION_ID) - 1)
        )
        method = (
            ((self.preprocessing & 0xF) << 4)
            | ((1 if self.checksum_enabled else 0) << 3)
            | (self.encoder_type & 0x7)
        )
        out = bytearray()
        out += version.to_bytes(2, "big")
        out += self.compressed_size.to_bytes(3, "big")
        out += self.original_size.to_bytes(3, "big")
        out += (self.identifier & ((1 << 48) - 1)).to_bytes(6, "big")
        out += bytes([self.sequence_number & 0xFF, method & 0xFF])
        assert len(out) == CMP_HDR_SIZE
        if self.has_extension:
            out += bytes([self.model_rate & 0xFF])
            out += (self.encoder_param & 0xFFFF).to_bytes(2, "big")
            out += (self.encoder_outlier & 0xFFFFFF).to_bytes(3, "big")
            assert len(out) == CMP_HDR_MAX_SIZE
        return bytes(out)

    @classmethod
    def deserialize(cls, src: bytes) -> "tuple[CmpHeader, int]":
        """Parse header bytes; returns (header, header_size_in_bytes).

        Mirrors reference cmp_hdr_deserialize (header.c:89-134).
        """
        if src is None:
            raise CmpError(CmpErrorCode.INT_HDR)
        if len(src) < CMP_HDR_SIZE:
            raise CmpError(CmpErrorCode.INT_HDR)
        version = int.from_bytes(src[0:2], "big")
        hdr = cls(
            version_flag=(version >> CMP_HDR_BITS_VERSION_ID) & 1,
            version_id=version & ((1 << CMP_HDR_BITS_VERSION_ID) - 1),
            compressed_size=int.from_bytes(src[2:5], "big"),
            original_size=int.from_bytes(src[5:8], "big"),
            identifier=int.from_bytes(src[8:14], "big"),
            sequence_number=src[14],
            preprocessing=(src[15] >> 4) & 0xF,
            checksum_enabled=(src[15] >> 3) & 0x1,
            encoder_type=src[15] & 0x7,
        )
        if not hdr.has_extension:
            return hdr, CMP_HDR_SIZE
        if len(src) < CMP_HDR_SIZE + CMP_EXT_HDR_SIZE:
            raise CmpError(CmpErrorCode.INT_HDR)
        hdr.model_rate = src[16]
        hdr.encoder_param = int.from_bytes(src[17:19], "big")
        hdr.encoder_outlier = int.from_bytes(src[19:22], "big")
        return hdr, CMP_HDR_SIZE + CMP_EXT_HDR_SIZE


@dataclasses.dataclass
class HeaderBatch:
    """Column-wise view of B parsed headers (all fields numpy arrays).

    The batched counterpart of :class:`CmpHeader` for the device decode
    tiers: one vectorized parse replaces B sequential
    ``CmpHeader.deserialize`` calls (the per-frame Python loop dominated
    the public decode wrapper at B=1024).  Field semantics and offsets
    are identical to :meth:`CmpHeader.deserialize`
    (reference lib/common/header.c:89-134).
    """

    compressed_size: "np.ndarray"   # (B,) int64
    original_size: "np.ndarray"     # (B,) int64
    identifier: "np.ndarray"        # (B,) uint64
    sequence_number: "np.ndarray"   # (B,) int32
    preprocessing: "np.ndarray"     # (B,) int32
    checksum_enabled: "np.ndarray"  # (B,) int32 (0/1)
    encoder_type: "np.ndarray"      # (B,) int32
    model_rate: "np.ndarray"        # (B,) int32 (0 when no extension)
    encoder_param: "np.ndarray"     # (B,) uint32 (0 when no extension)
    encoder_outlier: "np.ndarray"   # (B,) uint32 (0 when no extension)
    header_size: "np.ndarray"       # (B,) int64: 16 or 22

    @property
    def has_extension(self) -> "np.ndarray":
        return (self.preprocessing != 0) | (self.encoder_type != 0)


def parse_headers_batch(buf) -> HeaderBatch:
    """Parse B headers from a zero-padded (B, >=22) uint8 byte matrix.

    Performs NO validation (rows whose frames were shorter than their
    header parse as zeros); callers validate against the known frame
    lengths (see models/stream.BatchDecompressor.stage_frames).
    """
    import numpy as np

    u = buf[:, :CMP_HDR_MAX_SIZE].astype(np.int64)
    prep = (u[:, 15] >> 4) & 0xF
    enc = u[:, 15] & 0x7
    ext = (prep != 0) | (enc != 0)
    return HeaderBatch(
        compressed_size=(u[:, 2] << 16) | (u[:, 3] << 8) | u[:, 4],
        original_size=(u[:, 5] << 16) | (u[:, 6] << 8) | u[:, 7],
        identifier=(
            (u[:, 8] << 40) | (u[:, 9] << 32) | (u[:, 10] << 24)
            | (u[:, 11] << 16) | (u[:, 12] << 8) | u[:, 13]
        ).astype(np.uint64),
        sequence_number=u[:, 14].astype(np.int32),
        preprocessing=prep.astype(np.int32),
        checksum_enabled=((u[:, 15] >> 3) & 1).astype(np.int32),
        encoder_type=enc.astype(np.int32),
        model_rate=np.where(ext, u[:, 16], 0).astype(np.int32),
        encoder_param=np.where(ext, (u[:, 17] << 8) | u[:, 18],
                               0).astype(np.uint32),
        encoder_outlier=np.where(
            ext, (u[:, 19] << 16) | (u[:, 20] << 8) | u[:, 21],
            0).astype(np.uint32),
        header_size=np.where(ext, CMP_HDR_MAX_SIZE, CMP_HDR_SIZE)
        .astype(np.int64),
    )
