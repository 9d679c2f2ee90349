"""Stream decompression: the capability the reference leaves unimplemented.

The reference CLI prints "Decompression not implemented yet"
(programs/airspacecli.c:421-423); only header deserialization exists
(lib/common/header.c:89-134).  This module decodes full AIRSPACE streams:
a stream is a concatenation of self-delimiting blocks (each header carries
its own ``compressed_size``), and blocks belonging to one model chain share
an ``identifier`` and carry increasing ``sequence_number``s.

Model chains are reconstructed exactly: after decoding a block, the decoder
applies the same model seeding/EMA update the encoder applied
(reference cmp.c:296-312), so MODEL-preprocessed secondary passes decode
losslessly.  Because the header does not record the input dtype, the model
update's signedness is ambiguous for U16 vs I16 sources; the decoder takes
``cmp_type`` (default U16, the CLI's convention) to resolve it.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..format.dtypes import CmpType
from ..format.errors import CmpError, CmpErrorCode
from ..format.header import CmpHeader
from ..format.params import Preprocessing
from .host import decode_block, update_model

__all__ = ["decompress", "decompress_blocks", "DecodedBlock", "DecoderState"]


@dataclasses.dataclass
class DecodedBlock:
    samples: np.ndarray  # uint16, packed representation
    header: CmpHeader
    offset: int  # byte offset of the block in the stream
    size: int    # block size in bytes (header.compressed_size)


class DecoderState:
    """Carries model-chain state across blocks of one stream."""

    def __init__(self, cmp_type: CmpType = CmpType.U16):
        self.cmp_type = cmp_type
        self.model: np.ndarray | None = None
        self.identifier: int | None = None

    def update_after_block(self, hdr: CmpHeader, samples_u16: np.ndarray) -> None:
        """Apply the encoder's model-state transition for a decoded block."""
        samples_i16 = samples_u16.view(np.int16)
        if hdr.sequence_number == 0:
            # primary pass: model (re)seeded with this frame (cmp.c:304-307)
            self.model = samples_i16.copy()
            self.identifier = hdr.identifier
        else:
            if self.model is None or self.model.size != samples_i16.size:
                raise CmpError(
                    CmpErrorCode.SRC_SIZE_MISMATCH,
                    "secondary block without a matching model chain",
                )
            self.model = update_model(samples_i16, self.model,
                                      hdr.model_rate, self.cmp_type)


def decompress_blocks(stream: bytes, cmp_type: CmpType = CmpType.U16,
                      verify_checksum: bool = True) -> "list[DecodedBlock]":
    """Decode every block of a concatenated AIRSPACE stream, in order."""
    blocks: list[DecodedBlock] = []
    state = DecoderState(cmp_type)
    offset = 0
    n = len(stream)
    while offset < n:
        frame = stream[offset:]
        hdr, _ = CmpHeader.deserialize(frame)
        model = None
        if hdr.preprocessing == int(Preprocessing.MODEL):
            if hdr.sequence_number == 0:
                raise CmpError(CmpErrorCode.INT_HDR,
                               "MODEL preprocessing on a primary pass")
            model = state.model
            if model is None:
                raise CmpError(CmpErrorCode.SRC_SIZE_MISMATCH,
                               "MODEL block without preceding chain state")
        samples, hdr, size = decode_block(frame, model, verify_checksum)
        # A model is maintained whenever a chain might use it; seeding on
        # sequence 0 costs little and matches the encoder whenever
        # model_is_needed was true.  (Extra seeding when the encoder had no
        # model configured is unobservable.)
        state.update_after_block(hdr, samples)
        blocks.append(DecodedBlock(samples, hdr, offset, size))
        if size <= 0:
            raise CmpError(CmpErrorCode.INT_HDR, "zero-size block")
        offset += size
    return blocks


def decompress(stream: bytes, cmp_type: CmpType = CmpType.U16,
               verify_checksum: bool = True):
    """Decode a stream -> (samples_u16 concatenated, list of headers)."""
    blocks = decompress_blocks(stream, cmp_type, verify_checksum)
    if not blocks:
        return np.zeros(0, dtype=np.uint16), []
    samples = np.concatenate([b.samples for b in blocks])
    return samples, [b.header for b in blocks]
