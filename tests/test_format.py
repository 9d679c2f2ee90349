"""Format-layer tests: header ser/de, error codes, parameter validation.

Golden vectors derive from the reference unit tests (test/test_header.c,
test/test_initialisation.c) and the header layout of
lib/cmp_header.h:26-58 / lib/common/header_private.h:23-42.
"""

import pytest

from airs_compression_tpu import (
    CMP_HDR_MAX_SIZE,
    CMP_HDR_SIZE,
    CMP_VERSION_NUMBER,
    CmpError,
    CmpErrorCode,
    CmpHeader,
    CmpParams,
    EncoderType,
    Preprocessing,
    cal_work_buf_size,
    compress_bound,
    uncompressed_bound,
)
from airs_compression_tpu.format.errors import (
    error_to_u32,
    u32_is_error,
    u32_to_error_code,
)


class TestHeader:
    def test_basic_header_roundtrip(self):
        hdr = CmpHeader(
            compressed_size=0x123456,
            original_size=0x0ABCDE,
            identifier=0x010203040506,
            sequence_number=0x42,
        )
        data = hdr.serialize()
        assert len(data) == CMP_HDR_SIZE
        back, size = CmpHeader.deserialize(data)
        assert size == CMP_HDR_SIZE
        assert back.compressed_size == 0x123456
        assert back.original_size == 0x0ABCDE
        assert back.identifier == 0x010203040506
        assert back.sequence_number == 0x42
        assert back.version_flag == 1
        assert back.version_id == CMP_VERSION_NUMBER

    def test_extended_header_roundtrip(self):
        hdr = CmpHeader(
            compressed_size=100,
            original_size=50,
            preprocessing=int(Preprocessing.MODEL),
            checksum_enabled=1,
            encoder_type=int(EncoderType.GOLOMB_MULTI),
            model_rate=5,
            encoder_param=0xBEEF,
            encoder_outlier=0xABCDEF,
        )
        data = hdr.serialize()
        assert len(data) == CMP_HDR_MAX_SIZE
        back, size = CmpHeader.deserialize(data)
        assert size == CMP_HDR_MAX_SIZE
        assert back.preprocessing == int(Preprocessing.MODEL)
        assert back.checksum_enabled == 1
        assert back.encoder_type == int(EncoderType.GOLOMB_MULTI)
        assert back.model_rate == 5
        assert back.encoder_param == 0xBEEF
        assert back.encoder_outlier == 0xABCDEF

    def test_known_byte_layout(self):
        """Field offsets per the format spec (cmp_header.h:26-51)."""
        hdr = CmpHeader(
            compressed_size=0x000102,
            original_size=0x030405,
            identifier=0x060708090A0B,
            sequence_number=0x0C,
            preprocessing=0x1,
            checksum_enabled=1,
            encoder_type=0x2,
            model_rate=0x0D,
            encoder_param=0x0E0F,
            encoder_outlier=0x101112,
        )
        b = hdr.serialize()
        version = (1 << 15) | CMP_VERSION_NUMBER
        assert b[0:2] == version.to_bytes(2, "big")
        assert b[2:5] == bytes([0x00, 0x01, 0x02])
        assert b[5:8] == bytes([0x03, 0x04, 0x05])
        assert b[8:14] == bytes([0x06, 0x07, 0x08, 0x09, 0x0A, 0x0B])
        assert b[14] == 0x0C
        assert b[15] == (0x1 << 4) | (1 << 3) | 0x2
        assert b[16] == 0x0D
        assert b[17:19] == bytes([0x0E, 0x0F])
        assert b[19:22] == bytes([0x10, 0x11, 0x12])

    def test_no_extension_for_plain_mode(self):
        hdr = CmpHeader(compressed_size=20, original_size=4)
        assert hdr.size == CMP_HDR_SIZE
        assert not hdr.has_extension

    def test_oversized_fields_rejected(self):
        with pytest.raises(CmpError) as e:
            CmpHeader(compressed_size=1 << 24, original_size=4).serialize()
        assert e.value.code == CmpErrorCode.HDR_CMP_SIZE_TOO_LARGE
        with pytest.raises(CmpError) as e:
            CmpHeader(compressed_size=4, original_size=1 << 24).serialize()
        assert e.value.code == CmpErrorCode.HDR_ORIGINAL_TOO_LARGE

    def test_truncated_deserialize(self):
        with pytest.raises(CmpError):
            CmpHeader.deserialize(b"\x00" * 4)


class TestErrors:
    def test_u32_encoding_roundtrip(self):
        """Negated-uint32 convention (reference err_private.h:24-47)."""
        for code in CmpErrorCode:
            if code in (CmpErrorCode.NO_ERROR, CmpErrorCode.MAX_CODE):
                continue
            u = error_to_u32(code)
            assert u32_is_error(u)
            assert u32_to_error_code(u) == code
        assert not u32_is_error(0)
        assert not u32_is_error(12345)
        assert not u32_is_error(error_to_u32(CmpErrorCode.MAX_CODE))


class TestParams:
    def test_default_params_valid(self):
        CmpParams().validate()

    def test_secondary_iterations_limit(self):
        CmpParams(secondary_iterations=255).validate()
        with pytest.raises(CmpError) as e:
            CmpParams(secondary_iterations=256).validate()
        assert e.value.code == CmpErrorCode.PARAMS_INVALID

    def test_golomb_par_range(self):
        with pytest.raises(CmpError):
            CmpParams(primary_encoder_type=EncoderType.GOLOMB_ZERO,
                      primary_encoder_param=0).validate()
        with pytest.raises(CmpError):
            CmpParams(primary_encoder_type=EncoderType.GOLOMB_ZERO,
                      primary_encoder_param=0x10000).validate()
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=0xFFFF).validate()

    def test_multi_needs_valid_outlier(self):
        with pytest.raises(CmpError):
            # outlier 0 is invalid for MULTI
            CmpParams(primary_encoder_type=EncoderType.GOLOMB_MULTI,
                      primary_encoder_param=1,
                      primary_encoder_outlier=0).validate()
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_MULTI,
                  primary_encoder_param=1,
                  primary_encoder_outlier=5).validate()

    def test_model_only_secondary(self):
        with pytest.raises(CmpError):
            cal_work_buf_size(
                CmpParams(primary_preprocessing=Preprocessing.MODEL), 16)

    def test_model_rate_limit(self):
        p = CmpParams(secondary_iterations=1,
                      secondary_preprocessing=Preprocessing.MODEL,
                      model_rate=16)
        p.validate()
        with pytest.raises(CmpError):
            CmpParams(secondary_iterations=1,
                      secondary_preprocessing=Preprocessing.MODEL,
                      model_rate=17).validate()

    def test_work_buf_sizes(self):
        """Work-buffer math (reference cmp.c:77-103, preprocess.c:301-367)."""
        assert cal_work_buf_size(CmpParams(), 100) == 0
        assert cal_work_buf_size(
            CmpParams(primary_preprocessing=Preprocessing.DIFF), 100) == 0
        assert cal_work_buf_size(
            CmpParams(primary_preprocessing=Preprocessing.IWT), 100) == 100
        assert cal_work_buf_size(
            CmpParams(primary_preprocessing=Preprocessing.IWT), 101) == 102
        assert cal_work_buf_size(
            CmpParams(secondary_iterations=1,
                      secondary_preprocessing=Preprocessing.MODEL), 64) == 64

    def test_compress_bound(self):
        """Bound math (reference cmp.c:59-74, encoder.c:381-386)."""
        # 4 bytes -> 2 samples -> 2*48 bits = 12 bytes + 22 + 4
        assert compress_bound(4) == 22 + 4 + 12
        with pytest.raises(CmpError):
            compress_bound((1 << 24))

    def test_uncompressed_bound(self):
        assert uncompressed_bound(4) == 16 + 4 + 4
        limit = (1 << 24) - 1 - 16 - 4
        assert uncompressed_bound(limit) == 16 + limit + 4
        assert uncompressed_bound(limit + 1) == (1 << 64) - 1
