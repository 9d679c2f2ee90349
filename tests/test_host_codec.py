"""Host codec tests against reference golden vectors.

Golden byte arrays are transcribed from the reference unit tests
(test/test_encoder.c, test/test_preprocessing.c) and pin down bit-exact
encoder output, outlier derivation, multi-pass behavior, and model updates.
Round-trip tests exercise the decoder (a capability the reference lacks).
"""

import numpy as np
import pytest

from airs_compression_tpu import (
    CMP_HDR_MAX_SIZE,
    CMP_HDR_SIZE,
    CmpContext,
    CmpError,
    CmpErrorCode,
    CmpHeader,
    CmpParams,
    EncoderType,
    Preprocessing,
    decompress,
)
from airs_compression_tpu.engine import host
from airs_compression_tpu.utils import bits as ubits


def _encode(enc_type, g_par, outlier, data_i16, dst_cap=None):
    params = CmpParams(primary_encoder_type=enc_type,
                       primary_encoder_param=g_par,
                       primary_encoder_outlier=outlier)
    ctx = CmpContext(params)
    return ctx.compress_u16(np.asarray(data_i16, dtype=np.int16).view(np.uint16),
                            dst_cap)


def _check_golden(enc_type, g_par, outlier, data, expected_payload,
                  expected_hdr_outlier):
    """Mirror of run_encoder_test (reference test_encoder.c:106-140)."""
    out = _encode(enc_type, g_par, outlier, data)
    assert len(out) == CMP_HDR_MAX_SIZE + len(expected_payload)
    assert out[CMP_HDR_MAX_SIZE:] == bytes(expected_payload)
    hdr, _ = CmpHeader.deserialize(out)
    assert hdr.compressed_size == len(out)
    assert hdr.original_size == len(data) * 2
    assert hdr.encoder_type == int(enc_type)
    assert hdr.encoder_param == g_par
    assert hdr.encoder_outlier == expected_hdr_outlier


class TestGolombZeroGoldens:
    """Reference test_encoder.c:143-211."""

    def test_param1_normal_values(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 1, 0, [-8, 7, -1, 0],
                      [0xFF, 0xFF, 0x7F, 0xFF, 0x68], 16)

    def test_param1_lowest_outlier(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 1, 0, [8],
                      [0x00, 0x08, 0x00], 16)

    def test_param1_highest_outlier(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 1, 0, [-32768],
                      [0x7F, 0xFF, 0x80], 16)

    def test_param10_normal_values(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 10, 0, [82, 4, 0],
                      [0xFF, 0xFF, 0x57, 0x88], 165)

    def test_param10_lowest_outlier(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 10, 0, [-83],
                      [0x00, 0x0A, 0x50], 165)

    def test_param10_highest_outlier(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 10, 0, [-32768],
                      [0x0F, 0xFF, 0xF0], 165)

    def test_param_max_normal_values(self):
        _check_golden(EncoderType.GOLOMB_ZERO, 0xFFFF, 0, [0, -32768],
                      [0x00, 0x01, 0x40, 0x00, 0x40], 0xFFFF0)


class TestGolombMultiGoldens:
    """Reference test_encoder.c:214-281."""

    def test_param1_normal_values(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 5, [0, 2], [0x78], 5)

    def test_2bit_outliers(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 5, [-3, 3, -4, 4],
                      [0xF8, 0xF9, 0xFA, 0xFB], 5)

    def test_4bit_outliers(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 5, [-5, 10],
                      [0xFC, 0x9F, 0xBC], 5)

    def test_largest_16bit_outlier(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 5, [-32768],
                      [0xFF, 0xF7, 0xFF, 0xD0], 5)

    def test_clamp_outlier_max_normal(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 42, [-12],
                      [0xFF, 0xFF, 0xFE], 24)

    def test_clamp_outlier_min_outlier(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 42, [12],
                      [0xFF, 0xFF, 0xFF, 0x00], 24)

    def test_clamp_outlier_max_outlier(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 1, 42, [-32768],
                      [0xFF, 0xFF, 0xFF, 0xFE, 0xFF, 0xE7], 24)

    def test_param_max_zero_value(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 0xFFFF, 0xFFFFFFFF, [0],
                      [0x00, 0x00], 0xFFFE9)

    def test_param_max_largest_value(self):
        _check_golden(EncoderType.GOLOMB_MULTI, 0xFFFF, 0xFFFFFFFF, [-32768],
                      [0x80, 0x00, 0x00], 0xFFFE9)


class TestOutlierDerivation:
    """Closed-form outlier math (reference encoder.c:63-182)."""

    @pytest.mark.parametrize("g,expected", [(1, 16), (10, 165), (0xFFFF, 0xFFFF0)])
    def test_optimal_outlier_zero(self, g, expected):
        assert ubits.derive_encoder_outlier(1, g, 0) == expected

    def test_multi_clamp(self):
        assert ubits.derive_encoder_outlier(2, 1, 42) == 24
        assert ubits.derive_encoder_outlier(2, 0xFFFF, 0xFFFFFFFF) == 0xFFFE9


class TestSecondaryPass:
    def test_secondary_encoder_for_second_pass(self):
        """Reference test_encoder.c:304-349."""
        data = np.array([82, 4, 0], dtype=np.uint16)
        params = CmpParams(primary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_iterations=1,
                           secondary_encoder_type=EncoderType.GOLOMB_ZERO,
                           secondary_encoder_param=10)
        ctx = CmpContext(params)
        out1 = ctx.compress_u16(data)
        assert len(out1) == CMP_HDR_SIZE + 6
        assert out1[CMP_HDR_SIZE:] == bytes([0, 82, 0, 4, 0, 0])
        hdr1, _ = CmpHeader.deserialize(out1)
        assert hdr1.sequence_number == 0
        assert hdr1.encoder_type == int(EncoderType.UNCOMPRESSED)

        out2 = ctx.compress_u16(data)
        assert len(out2) == CMP_HDR_MAX_SIZE + 4
        assert out2[CMP_HDR_MAX_SIZE:] == bytes([0xFF, 0xFF, 0x57, 0x88])
        hdr2, _ = CmpHeader.deserialize(out2)
        assert hdr2.sequence_number == 1
        assert hdr2.encoder_type == int(EncoderType.GOLOMB_ZERO)
        assert hdr2.encoder_param == 10
        assert hdr2.encoder_outlier == 165

        # third pass wraps back to primary, sequence resets
        out3 = ctx.compress_u16(data)
        hdr3, _ = CmpHeader.deserialize(out3)
        assert hdr3.sequence_number == 0
        assert hdr3.encoder_type == int(EncoderType.UNCOMPRESSED)


class TestPreprocessing:
    def test_diff_golden(self):
        """Reference test_preprocessing.c:36-39."""
        src = np.array([0x0001, 0x0003, 0x0000, 0xFFFF, 0x0000, 0x7FFF,
                        0x8000, 0xFFFB], dtype=np.uint16)
        expected = np.array([1, 2, -3, -1, 1, 32767, 1, 0x7FFB], dtype=np.int16)
        got = host.preprocess_forward(Preprocessing.DIFF, src.view(np.int16))
        np.testing.assert_array_equal(got, expected)
        back = host.preprocess_inverse(Preprocessing.DIFF, expected)
        np.testing.assert_array_equal(back.view(np.uint16), src)

    @pytest.mark.parametrize("inp,exp", [
        ([42], [42]),
        ([-23809, 23901], [-32722, -17826]),
        ([-1, 2, -3, 4, -5], [0, 4, 0, 8, -2]),
        ([0, 0, 2, 0, 0, 0, 0], [-1, -1, 2, -1, -1, 0, 1]),
        ([-3, 2, -1, 3, -2, 5, 0, 7], [0, 4, 2, 5, 1, 6, 3, 7]),
    ])
    def test_iwt_goldens(self, inp, exp):
        """Reference test_preprocessing.c:74-92 (inputs use u16 wraparound)."""
        src = np.array(inp, dtype=np.int64).astype(np.uint16).view(np.int16)
        got = host.iwt_forward(src)
        np.testing.assert_array_equal(got, np.array(exp, dtype=np.int16))
        back = host.iwt_inverse(got)
        np.testing.assert_array_equal(back, src)

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 16, 63, 64, 100, 1000])
    def test_iwt_roundtrip_random(self, n):
        rng = np.random.default_rng(n)
        src = rng.integers(-32768, 32768, n).astype(np.int16)
        np.testing.assert_array_equal(host.iwt_inverse(host.iwt_forward(src)), src)

    def test_model_updates_u16(self):
        """Reference test_preprocessing.c:222-236 (u16 variant, rate=1)."""
        params = CmpParams(primary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_preprocessing=Preprocessing.MODEL,
                           model_rate=1, secondary_iterations=2)
        ctx = CmpContext(params)
        in1 = np.array([0, 2, 21, 1, 0xFFFF], dtype=np.uint16)
        in2 = np.array([1, 3, 5, 0xFFFF, 0xFFFF], dtype=np.uint16)
        in3 = np.zeros(5, dtype=np.uint16)
        expected = np.array([0, -2, -6, -61439, -0xFFFF & 0xFFFF],
                            dtype=np.int64).astype(np.uint16).view(np.int16)
        ctx.compress_u16(in1)
        ctx.compress_u16(in2)
        out = ctx.compress_u16(in3)
        assert len(out) == CMP_HDR_MAX_SIZE + 10
        payload = np.frombuffer(out[CMP_HDR_MAX_SIZE:], dtype=">i2").astype(np.int16)
        np.testing.assert_array_equal(payload, expected)
        hdr, _ = CmpHeader.deserialize(out)
        assert hdr.sequence_number == 2
        assert hdr.model_rate == 1
        assert hdr.preprocessing == int(Preprocessing.MODEL)

    def test_model_updates_i16(self):
        """Reference test_preprocessing.c:227-236 (i16 variant)."""
        params = CmpParams(primary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_preprocessing=Preprocessing.MODEL,
                           model_rate=1, secondary_iterations=2)
        ctx = CmpContext(params)
        in1 = np.array([15, 2, 21, 0, 0, -32768, 32767], dtype=np.int16)
        in2 = np.array([-2, 3, 5, -1, 0, -32768, 32767], dtype=np.int16)
        in3 = np.zeros(7, dtype=np.int16)
        expected = np.array([1, -2, -6, 1, 0, -(-32768) & 0xFFFF, -32767],
                            dtype=np.int64).astype(np.uint16).view(np.int16)
        ctx.compress_i16(in1)
        ctx.compress_i16(in2)
        out = ctx.compress_i16(in3)
        payload = np.frombuffer(out[CMP_HDR_MAX_SIZE:], dtype=">i2").astype(np.int16)
        np.testing.assert_array_equal(payload, expected)

    def test_primary_after_max_secondary_iterations(self):
        """Reference test_preprocessing.c:283-313: chain wraps to primary."""
        params = CmpParams(primary_encoder_type=EncoderType.UNCOMPRESSED,
                           secondary_preprocessing=Preprocessing.MODEL,
                           secondary_iterations=2)
        ctx = CmpContext(params)
        data = np.array([1, 2, 3, 4], dtype=np.uint16)
        seqs = []
        for _ in range(4):
            out = ctx.compress_u16(data)
            hdr, _ = CmpHeader.deserialize(out)
            seqs.append((hdr.sequence_number, hdr.preprocessing))
        assert seqs == [(0, 0), (1, 3), (2, 3), (0, 0)]


class TestChecksum:
    def test_checksum_appended_and_verified(self):
        params = CmpParams(checksum_enabled=True)
        ctx = CmpContext(params)
        data = np.arange(100, dtype=np.uint16)
        out = ctx.compress_u16(data)
        assert len(out) == CMP_HDR_SIZE + 200 + 4
        dec, hdrs = decompress(out)
        np.testing.assert_array_equal(dec, data)
        assert hdrs[0].checksum_enabled == 1

    def test_corrupt_checksum_detected(self):
        ctx = CmpContext(CmpParams(checksum_enabled=True))
        out = bytearray(ctx.compress_u16(np.arange(10, dtype=np.uint16)))
        out[-1] ^= 0xFF
        with pytest.raises(CmpError):
            decompress(bytes(out))


class TestRoundTrip:
    CONFIGS = [
        CmpParams(),
        CmpParams(primary_preprocessing=Preprocessing.DIFF,
                  primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=4),
        CmpParams(primary_preprocessing=Preprocessing.DIFF,
                  primary_encoder_type=EncoderType.GOLOMB_MULTI,
                  primary_encoder_param=4, primary_encoder_outlier=50),
        CmpParams(primary_preprocessing=Preprocessing.IWT,
                  primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=8, checksum_enabled=True),
        CmpParams(primary_preprocessing=Preprocessing.DIFF,
                  primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=1,
                  secondary_iterations=3,
                  secondary_preprocessing=Preprocessing.MODEL,
                  secondary_encoder_type=EncoderType.GOLOMB_MULTI,
                  secondary_encoder_param=2, secondary_encoder_outlier=30,
                  model_rate=6),
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_MULTI,
                  primary_encoder_param=0xFFFF,
                  primary_encoder_outlier=0xFFFFFFFF),
    ]

    @pytest.mark.parametrize("cfg", range(len(CONFIGS)))
    def test_random_roundtrip(self, cfg):
        params = self.CONFIGS[cfg]
        rng = np.random.default_rng(cfg)
        ctx = CmpContext(params)
        stream = b""
        frames = []
        for _ in range(5):
            # AIRS-like data: smooth background + noise + hot pixels
            base = rng.integers(1000, 1200)
            frame = (base + rng.normal(0, 8, 256)).astype(np.int64)
            hot = rng.integers(0, 256, 4)
            frame[hot] = rng.integers(0, 65536, 4)
            frame = (frame & 0xFFFF).astype(np.uint16)
            frames.append(frame)
            stream += ctx.compress_u16(frame)
        dec, hdrs = decompress(stream)
        np.testing.assert_array_equal(dec, np.concatenate(frames))
        assert len(hdrs) == 5

    def test_extreme_values_roundtrip(self):
        data = np.array([0, 0xFFFF, 0x8000, 0x7FFF, 1, 0xFFFE] * 10,
                        dtype=np.uint16)
        for params in self.CONFIGS:
            ctx = CmpContext(params)
            out = ctx.compress_u16(data)
            dec, _ = decompress(out)
            np.testing.assert_array_equal(dec, data)

    def test_i16_in_i32_roundtrip(self):
        rng = np.random.default_rng(7)
        data = rng.integers(0, 1 << 32, 64, dtype=np.uint32).astype(np.int64)
        data = (data - (1 << 31)).astype(np.int32)
        ctx = CmpContext(self.CONFIGS[1])
        out = ctx.compress_i16_in_i32(data)
        hdr, _ = CmpHeader.deserialize(out)
        assert hdr.original_size == 128  # packed size, not source size
        dec, _ = decompress(out)
        np.testing.assert_array_equal(dec, (data.view(np.uint32) & 0xFFFF)
                                      .astype(np.uint16))


class TestFallback:
    def test_fallback_to_uncompressed(self):
        """Incompressible data falls back (reference cmp.c:342-393)."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 65536, 512).astype(np.uint16)
        params = CmpParams(primary_preprocessing=Preprocessing.NONE,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=1,
                           uncompressed_fallback_enabled=True)
        ctx = CmpContext(params)
        out = ctx.compress_u16(data)
        hdr, _ = CmpHeader.deserialize(out)
        assert hdr.encoder_type == int(EncoderType.UNCOMPRESSED)
        assert hdr.preprocessing == int(Preprocessing.NONE)
        assert len(out) == CMP_HDR_SIZE + 1024
        dec, _ = decompress(out)
        np.testing.assert_array_equal(dec, data)

    def test_no_fallback_when_compressible(self):
        data = np.full(512, 1000, dtype=np.uint16)
        params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                           primary_encoder_type=EncoderType.GOLOMB_ZERO,
                           primary_encoder_param=1,
                           uncompressed_fallback_enabled=True)
        ctx = CmpContext(params)
        out = ctx.compress_u16(data)
        hdr, _ = CmpHeader.deserialize(out)
        assert hdr.encoder_type == int(EncoderType.GOLOMB_ZERO)
        assert len(out) < CMP_HDR_SIZE + 1024
        dec, _ = decompress(out)
        np.testing.assert_array_equal(dec, data)

    def test_dst_too_small_error(self):
        data = np.arange(100, dtype=np.uint16)
        ctx = CmpContext(CmpParams())
        with pytest.raises(CmpError) as e:
            ctx.compress_u16(data, dst_capacity=50)
        assert e.value.code == CmpErrorCode.DST_TOO_SMALL


class TestErrorsApi:
    def test_src_size_wrong(self):
        ctx = CmpContext(CmpParams())
        with pytest.raises(CmpError) as e:
            ctx.compress_u16(np.zeros(0, dtype=np.uint16))
        assert e.value.code == CmpErrorCode.SRC_SIZE_WRONG

    def test_model_src_size_mismatch(self):
        params = CmpParams(secondary_iterations=2,
                           secondary_preprocessing=Preprocessing.MODEL)
        ctx = CmpContext(params)
        ctx.compress_u16(np.arange(8, dtype=np.uint16))
        with pytest.raises(CmpError) as e:
            ctx.compress_u16(np.arange(16, dtype=np.uint16))
        assert e.value.code == CmpErrorCode.SRC_SIZE_MISMATCH
