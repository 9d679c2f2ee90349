"""Decoder robustness on malformed / truncated / corrupted streams.

The reference has no decoder, so there is no reference behavior to mirror
here; these tests pin down OUR contract: a malformed stream always raises
``CmpError`` with a sensible code — never a crash, hang, or silently wrong
output.  Valid-stream decoding is covered by the round-trip and oracle
suites; this file only feeds the decoder garbage.
"""

import numpy as np
import pytest

import airs_compression_tpu as act
from airs_compression_tpu.format.errors import CmpError, CmpErrorCode


def _frame(params=None, n=64, seed=0):
    rng = np.random.default_rng(seed)
    samples = rng.integers(0, 1 << 16, n).astype(np.uint16)
    params = params or act.CmpParams(
        primary_preprocessing=act.Preprocessing.DIFF,
        primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        primary_encoder_param=4,
        checksum_enabled=True,
    )
    ctx = act.CmpContext(params)
    return ctx.compress_u16(samples), samples


class TestTruncation:
    def test_truncated_mid_header(self):
        blob, _ = _frame()
        for cut in (1, 7, 15):
            with pytest.raises(CmpError):
                act.decompress(blob[:cut])

    def test_truncated_mid_extension_header(self):
        blob, _ = _frame()  # DIFF+GOLOMB -> 22-byte header
        with pytest.raises(CmpError):
            act.decompress(blob[:18])

    def test_truncated_payload(self):
        blob, _ = _frame()
        # every truncation point inside the payload must raise, not wrap
        for cut in range(22, len(blob) - 1, 7):
            with pytest.raises(CmpError):
                act.decompress(blob[:cut])

    def test_truncated_checksum(self):
        blob, _ = _frame()
        with pytest.raises(CmpError):
            act.decompress(blob[:-2])


class TestHeaderLies:
    def _mutate(self, blob, offset, value):
        b = bytearray(blob)
        b[offset] = value
        return bytes(b)

    def test_compressed_size_smaller_than_header(self):
        blob, _ = _frame()
        # compressed_size is 24 bits at byte offset 2
        bad = bytearray(blob)
        bad[2:5] = (10).to_bytes(3, "big")
        with pytest.raises(CmpError) as ei:
            act.decompress(bytes(bad))
        assert ei.value.code == CmpErrorCode.INT_HDR

    def test_compressed_size_beyond_stream(self):
        blob, _ = _frame()
        bad = bytearray(blob)
        bad[2:5] = (len(blob) + 100).to_bytes(3, "big")
        with pytest.raises(CmpError) as ei:
            act.decompress(bytes(bad))
        assert ei.value.code == CmpErrorCode.INT_HDR

    def test_odd_original_size(self):
        blob, _ = _frame()
        bad = bytearray(blob)
        bad[5:8] = (129).to_bytes(3, "big")
        with pytest.raises(CmpError) as ei:
            act.decompress(bytes(bad))
        assert ei.value.code == CmpErrorCode.INT_HDR

    def test_inflated_original_size_exhausts_bitstream(self):
        # claims more samples than the payload encodes -> bitstream error
        blob, _ = _frame()
        bad = bytearray(blob)
        bad[5:8] = (0x010000).to_bytes(3, "big")
        with pytest.raises(CmpError):
            act.decompress(bytes(bad))

    def test_zero_golomb_parameter(self):
        blob, _ = _frame()
        bad = bytearray(blob)
        bad[17:19] = (0).to_bytes(2, "big")  # encoder_param = 0
        with pytest.raises(CmpError) as ei:
            act.decompress(bytes(bad))
        assert ei.value.code == CmpErrorCode.PARAMS_INVALID

    def test_model_block_without_chain(self):
        params = act.CmpParams(
            primary_preprocessing=act.Preprocessing.DIFF,
            primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
            primary_encoder_param=4,
            secondary_iterations=2,
            secondary_preprocessing=act.Preprocessing.MODEL,
            secondary_encoder_type=act.EncoderType.GOLOMB_MULTI,
            secondary_encoder_param=2,
            secondary_encoder_outlier=40,
            model_rate=8,
        )
        rng = np.random.default_rng(1)
        samples = rng.integers(0, 1 << 16, 32).astype(np.uint16)
        ctx = act.CmpContext(params)
        first = ctx.compress_u16(samples)
        second = ctx.compress_u16(samples)  # MODEL-preprocessed, seq=1
        # the secondary block alone is undecodable without its chain head
        with pytest.raises(CmpError):
            act.decompress(second)
        # but the full chain decodes
        out, hdrs = act.decompress(first + second)
        assert np.array_equal(out.reshape(2, -1)[1], samples)


class TestCorruption:
    def test_checksum_detects_payload_corruption(self):
        blob, _ = _frame()
        for offset in range(22, min(len(blob) - 4, 40)):
            bad = bytearray(blob)
            bad[offset] ^= 0x40
            try:
                act.decompress(bytes(bad))
            except CmpError:
                continue  # either a bitstream error or checksum mismatch: OK
            pytest.fail(f"corruption at byte {offset} went undetected")

    def test_trailing_garbage_rejected(self):
        blob, _ = _frame()
        with pytest.raises(CmpError):
            act.decompress(blob + b"\x00\x01\x02")

    def test_random_garbage_never_crashes(self):
        rng = np.random.default_rng(42)
        for i in range(50):
            junk = rng.integers(0, 256, rng.integers(1, 120)).astype(
                np.uint8).tobytes()
            try:
                act.decompress(junk)
            except CmpError:
                pass  # any CmpError is acceptable; crashes are not

    def test_empty_stream(self):
        out, hdrs = act.decompress(b"")
        assert out.size == 0 and hdrs == []
