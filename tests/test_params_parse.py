"""Parameter-string grammar conformance (reference test_params_parse.c).

Mirrors the reference parser's behavioral matrix (params_parse.c:266-301,
test/test_params_parse.c): enum names with strippable prefixes, case
insensitivity, whitespace, repeated keys, empty segments, numeric ranges,
error cases, and the params -> string inverse.
"""

import pytest

from airs_compression_tpu.cli.params_parse import (
    ParseError,
    params_to_string,
    parse_params,
)
from airs_compression_tpu.format.params import (
    CmpParams,
    EncoderType,
    Preprocessing,
)


class TestEnumValues:
    @pytest.mark.parametrize("text,expected", [
        ("primary_preprocessing=NONE", Preprocessing.NONE),
        ("primary_preprocessing=none", Preprocessing.NONE),
        ("primary_preprocessing=DIFF", Preprocessing.DIFF),
        ("primary_preprocessing=IWT", Preprocessing.IWT),
        ("primary_preprocessing=MODEL", Preprocessing.MODEL),
        ("primary_preprocessing=CMP_PREPROCESS_DIFF", Preprocessing.DIFF),
        ("primary_preprocessing=PREPROCESS_IWT", Preprocessing.IWT),
        ("primary_preprocessing=CMP_MODEL", Preprocessing.MODEL),
        ("primary_preprocessing=cmp_preprocess_model", Preprocessing.MODEL),
    ])
    def test_preprocessing_names(self, text, expected):
        assert parse_params(text).primary_preprocessing == expected

    @pytest.mark.parametrize("text,expected", [
        ("primary_encoder_type=UNCOMPRESSED", EncoderType.UNCOMPRESSED),
        ("primary_encoder_type=GOLOMB_ZERO", EncoderType.GOLOMB_ZERO),
        ("primary_encoder_type=golomb_multi", EncoderType.GOLOMB_MULTI),
        ("primary_encoder_type=CMP_ENCODER_GOLOMB_ZERO",
         EncoderType.GOLOMB_ZERO),
        ("primary_encoder_type=ENCODER_GOLOMB_MULTI",
         EncoderType.GOLOMB_MULTI),
        ("primary_encoder_type=CMP_UNCOMPRESSED", EncoderType.UNCOMPRESSED),
    ])
    def test_encoder_names(self, text, expected):
        assert parse_params(text).primary_encoder_type == expected

    @pytest.mark.parametrize("text,expected", [
        ("checksum_enabled=TRUE", True),
        ("checksum_enabled=true", True),
        ("checksum_enabled=FALSE", False),
        ("checksum_enabled=1", True),
        ("checksum_enabled=0", False),
        ("uncompressed_fallback_enabled=TRUE", True),
    ])
    def test_booleans(self, text, expected):
        p = parse_params(text)
        field = text.split("=")[0]
        assert getattr(p, field) is expected


class TestNumericValues:
    def test_zero(self):
        assert parse_params("model_rate=0").model_rate == 0

    def test_typical(self):
        assert parse_params("primary_encoder_param=42") \
            .primary_encoder_param == 42

    def test_maximum_u32(self):
        p = parse_params("primary_encoder_outlier=4294967295")
        assert p.primary_encoder_outlier == 0xFFFFFFFF

    def test_above_u32_rejected(self):
        with pytest.raises(ParseError):
            parse_params("primary_encoder_outlier=4294967296")

    @pytest.mark.parametrize("bad", ["-1", "0x10", "1.5", "", "ten"])
    def test_invalid_numeric(self, bad):
        with pytest.raises(ParseError):
            parse_params(f"primary_encoder_param={bad}")


class TestGrammar:
    def test_last_value_wins_for_repeated_key(self):
        p = parse_params("primary_encoder_param=1,primary_encoder_param=7")
        assert p.primary_encoder_param == 7

    def test_trailing_comma_allowed(self):
        assert parse_params("model_rate=3,").model_rate == 3

    def test_double_comma_allowed(self):
        p = parse_params("model_rate=3,,primary_encoder_param=2")
        assert p.model_rate == 3 and p.primary_encoder_param == 2

    def test_whitespace_tolerated(self):
        p = parse_params("  model_rate = 3 ,\tprimary_encoder_param =\t2 ")
        assert p.model_rate == 3 and p.primary_encoder_param == 2

    def test_keys_case_insensitive(self):
        assert parse_params("MODEL_RATE=5").model_rate == 5
        assert parse_params("Model_Rate=5").model_rate == 5

    def test_all_parameters_in_one_string(self):
        text = ("primary_preprocessing=DIFF,primary_encoder_type=GOLOMB_ZERO,"
                "primary_encoder_param=4,primary_encoder_outlier=0,"
                "secondary_iterations=5,secondary_preprocessing=MODEL,"
                "secondary_encoder_type=GOLOMB_MULTI,"
                "secondary_encoder_param=2,secondary_encoder_outlier=40,"
                "model_rate=8,checksum_enabled=TRUE,"
                "uncompressed_fallback_enabled=FALSE")
        p = parse_params(text)
        assert p.primary_preprocessing == Preprocessing.DIFF
        assert p.secondary_iterations == 5
        assert p.secondary_encoder_outlier == 40
        assert p.model_rate == 8
        assert p.checksum_enabled is True
        assert p.uncompressed_fallback_enabled is False

    def test_base_params_are_defaults(self):
        base = CmpParams(model_rate=9)
        p = parse_params("primary_encoder_param=2", base=base)
        assert p.model_rate == 9 and p.primary_encoder_param == 2


class TestErrors:
    @pytest.mark.parametrize("bad", ["", " ", ",", ",,", " , "])
    def test_empty_string_rejected(self, bad):
        with pytest.raises(ParseError):
            parse_params(bad)

    def test_none_rejected(self):
        with pytest.raises(ParseError):
            parse_params(None)

    @pytest.mark.parametrize("bad", ["model_rate", "model_rate 3", "=3"])
    def test_missing_equals(self, bad):
        with pytest.raises(ParseError):
            parse_params(bad)

    @pytest.mark.parametrize("bad", [
        "primary_preprocessing=BOGUS",
        "primary_preprocessing=3",          # numeric for enum rejected
        "primary_encoder_type=ZERO",
        "checksum_enabled=YES",
    ])
    def test_invalid_enum_values(self, bad):
        with pytest.raises(ParseError):
            parse_params(bad)

    def test_unknown_key(self):
        with pytest.raises(ParseError):
            parse_params("frobnicate=1")


class TestToString:
    def test_all_keys_present(self):
        s = params_to_string(CmpParams())
        for key in ("primary_preprocessing", "primary_encoder_type",
                    "primary_encoder_param", "primary_encoder_outlier",
                    "secondary_iterations", "secondary_preprocessing",
                    "secondary_encoder_type", "secondary_encoder_param",
                    "secondary_encoder_outlier", "model_rate",
                    "checksum_enabled", "uncompressed_fallback_enabled"):
            assert key in s

    def test_bools_normalized(self):
        s = params_to_string(CmpParams(checksum_enabled=True))
        assert "checksum_enabled = TRUE" in s

    def test_roundtrip(self):
        p0 = CmpParams(primary_preprocessing=Preprocessing.IWT,
                       primary_encoder_type=EncoderType.GOLOMB_MULTI,
                       primary_encoder_param=11, primary_encoder_outlier=77,
                       secondary_iterations=2,
                       secondary_preprocessing=Preprocessing.MODEL,
                       secondary_encoder_type=EncoderType.GOLOMB_ZERO,
                       secondary_encoder_param=3, model_rate=5,
                       checksum_enabled=True)
        assert parse_params(params_to_string(p0)) == p0
