"""Compression-parameter string grammar (reference programs/params_parse.c).

``key=value,key2=value2,...`` with the reference's exact semantics:
case-insensitive enum names with strippable prefixes (``CMP_PREPROCESS_``,
``CMP_ENCODER_``, ``CMP_``, ``PREPROCESS_``, ``ENCODER_``), TRUE/FALSE/0/1
booleans, decimal uint32 values, whitespace tolerated around keys/values,
empty segments (double/trailing commas) skipped, empty string rejected.
Also provides the inverse ``params_to_string`` (params_parse.c:368-396).
"""

from __future__ import annotations

import dataclasses

from ..format.params import CmpParams, EncoderType, Preprocessing

__all__ = ["parse_params", "params_to_string", "ParseError"]


class ParseError(ValueError):
    """Parameter-string syntax/um value error (reference cmp_parse_status)."""


_PREPROCESSING = {"NONE": Preprocessing.NONE, "DIFF": Preprocessing.DIFF,
                  "IWT": Preprocessing.IWT, "MODEL": Preprocessing.MODEL}
_PREPROCESSING_PREFIXES = ("CMP_PREPROCESS_", "CMP_", "PREPROCESS_")

_ENCODER = {"UNCOMPRESSED": EncoderType.UNCOMPRESSED,
            "GOLOMB_ZERO": EncoderType.GOLOMB_ZERO,
            "GOLOMB_MULTI": EncoderType.GOLOMB_MULTI}
_ENCODER_PREFIXES = ("CMP_ENCODER_", "CMP_", "ENCODER_")

_BOOL = {"FALSE": 0, "TRUE": 1, "0": 0, "1": 1}
_BOOL_PREFIXES = ("CMP_",)

# key -> (field name, value map or None for uint32, prefixes)
_PARAM_KEYS = {
    "primary_preprocessing": ("primary_preprocessing", _PREPROCESSING, _PREPROCESSING_PREFIXES),
    "primary_encoder_type": ("primary_encoder_type", _ENCODER, _ENCODER_PREFIXES),
    "primary_encoder_param": ("primary_encoder_param", None, ()),
    "primary_encoder_outlier": ("primary_encoder_outlier", None, ()),
    "secondary_iterations": ("secondary_iterations", None, ()),
    "secondary_preprocessing": ("secondary_preprocessing", _PREPROCESSING, _PREPROCESSING_PREFIXES),
    "secondary_encoder_type": ("secondary_encoder_type", _ENCODER, _ENCODER_PREFIXES),
    "secondary_encoder_param": ("secondary_encoder_param", None, ()),
    "secondary_encoder_outlier": ("secondary_encoder_outlier", None, ()),
    "model_rate": ("model_rate", None, ()),
    "checksum_enabled": ("checksum_enabled", _BOOL, _BOOL_PREFIXES),
    "uncompressed_fallback_enabled": ("uncompressed_fallback_enabled", _BOOL, _BOOL_PREFIXES),
}


def _parse_u32(s: str) -> int:
    s = s.strip()
    if not s or not s.isdigit():
        raise ParseError(f"invalid unsigned integer: '{s}'")
    v = int(s)
    if v > 0xFFFFFFFF:
        raise ParseError(f"value out of uint32 range: '{s}'")
    return v


def _parse_value(value: str, value_map, prefixes) -> int:
    if value_map is None:
        return _parse_u32(value)
    v = value.strip().upper()
    for prefix in prefixes:
        if v.startswith(prefix) and v[len(prefix):] in value_map:
            v = v[len(prefix):]
            break
    if v not in value_map:
        raise ParseError(f"invalid value '{value.strip()}'")
    return int(value_map[v])


def parse_params(text: str, base: CmpParams | None = None) -> CmpParams:
    """Parse a ``key=value,...`` string into CmpParams.

    Mirrors reference cmp_params_parse (params_parse.c:266-301): empty
    segments are skipped, a fully empty string is an error, unknown keys
    and malformed pairs raise :class:`ParseError`.
    """
    if text is None:
        raise ParseError("missing parameter string")
    fields = dataclasses.asdict(base) if base else {}
    saw_any = False
    for segment in text.split(","):
        segment = segment.strip()
        if not segment:
            continue
        if "=" not in segment:
            raise ParseError(f"parameters string is missing '=': '{segment}'")
        key, _, value = segment.partition("=")
        key = key.strip().lower()
        if key not in _PARAM_KEYS:
            raise ParseError(f"unknown compression parameter: '{key}'")
        field, value_map, prefixes = _PARAM_KEYS[key]
        num = _parse_value(value, value_map, prefixes)
        if value_map in (_PREPROCESSING,):
            fields[field] = Preprocessing(num)
        elif value_map is _ENCODER:
            fields[field] = EncoderType(num)
        elif value_map is _BOOL:
            fields[field] = bool(num)
        else:
            fields[field] = num
        saw_any = True
    if not saw_any:
        raise ParseError("empty parameter string")
    return CmpParams(**fields)


def params_to_string(params: CmpParams) -> str:
    """Inverse of parse_params (reference cmp_params_to_string)."""
    rev_prep = {v: k for k, v in _PREPROCESSING.items()}
    rev_enc = {v: k for k, v in _ENCODER.items()}
    lines = []
    for key, (field, value_map, _) in _PARAM_KEYS.items():
        val = getattr(params, field)
        if value_map is _PREPROCESSING:
            s = rev_prep.get(Preprocessing(val), "INVALID")
        elif value_map is _ENCODER:
            s = rev_enc.get(EncoderType(val), "INVALID")
        elif value_map is _BOOL:
            s = "TRUE" if val else "FALSE"
        else:
            s = str(int(val))
        lines.append(f"{key} = {s}")
    return ",\n".join(lines) + "\n"
