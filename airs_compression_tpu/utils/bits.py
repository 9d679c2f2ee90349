"""Host-side integer/bit math shared across the framework.

These mirror the closed-form parameter math of the reference encoder
(lib/compress/encoder.c:40-182) exactly; the on-device kernels in
``airs_compression_tpu.ops`` recompute the same quantities with jnp ops.
"""

from __future__ import annotations

__all__ = [
    "U32_MAX",
    "CMP_MIN_GOLOMB_PAR",
    "CMP_MAX_GOLOMB_PAR",
    "CMP_GOLOMB_MAX_CODEWORD_BITS",
    "CMP_NUM_BITS_PER_SAMPLE",
    "CMP_MAX_BITS_PER_SAMPLE",
    "ilog2",
    "golomb_cutoff",
    "golomb_upper_bound",
    "golomb_optimal_outlier_zero",
    "derive_encoder_outlier",
    "max_compressed_payload_size",
    "div_round_up",
]

U32_MAX = 0xFFFFFFFF

CMP_MIN_GOLOMB_PAR = 1
CMP_MAX_GOLOMB_PAR = 0xFFFF
CMP_GOLOMB_MAX_CODEWORD_BITS = 32
CMP_NUM_BITS_PER_SAMPLE = 16

# Worst case bits per sample: max(zero escape, multi escape)
#   zero escape  = ilog2(65535)+1 + 16 = 32 bits
#   multi escape = 32-bit codeword + 16 raw bits = 48 bits
# (reference lib/compress/encoder.c:24-29)
CMP_MAX_BITS_PER_SAMPLE = max(
    (CMP_MAX_GOLOMB_PAR.bit_length() - 1) + 1 + CMP_NUM_BITS_PER_SAMPLE,
    CMP_GOLOMB_MAX_CODEWORD_BITS + CMP_NUM_BITS_PER_SAMPLE,
)


def div_round_up(n: int, d: int) -> int:
    return (n + d - 1) // d


def ilog2(x: int) -> int:
    """floor(log2(x)); UINT_MAX for x == 0 (reference encoder.c:40-49)."""
    if x == 0:
        return U32_MAX
    return x.bit_length() - 1


def golomb_cutoff(g_par: int) -> int:
    """Number of values in Golomb group 0: (2 << ilog2(g)) - g."""
    return (2 << ilog2(g_par)) - g_par


def golomb_upper_bound(g_par: int, encoder_type_is_multi: bool, n_bits: int = 16) -> int:
    """First value not encodable within the 32-bit codeword limit, or 0.

    Mirrors reference golomb_upper_bound (encoder.c:63-110).
    """
    if g_par < CMP_MIN_GOLOMB_PAR or g_par > CMP_MAX_GOLOMB_PAR:
        return 0
    if n_bits > CMP_NUM_BITS_PER_SAMPLE:
        return 0
    cutoff = golomb_cutoff(g_par)
    first_invalid_group = CMP_GOLOMB_MAX_CODEWORD_BITS + 1 - (ilog2(g_par) + 2)
    first_invalid_value = cutoff + first_invalid_group * g_par
    if encoder_type_is_multi:
        num_escape_symbols = (n_bits + 1) // 2
        if first_invalid_value > num_escape_symbols:
            first_invalid_value -= num_escape_symbols
        else:
            return 0
    return first_invalid_value & U32_MAX


def golomb_optimal_outlier_zero(g_par: int, n_bits: int = 16) -> int:
    """Optimal outlier threshold for the zero-escape mechanism, or 0.

    Mirrors reference golomb_optimal_outlier_zero (encoder.c:154-182).
    """
    if g_par < CMP_MIN_GOLOMB_PAR or g_par > CMP_MAX_GOLOMB_PAR:
        return 0
    if n_bits < 1 or n_bits > CMP_GOLOMB_MAX_CODEWORD_BITS:
        return 0
    cutoff = golomb_cutoff(g_par)
    outlier = cutoff + n_bits * g_par - 1
    return min(outlier, U32_MAX)


def derive_encoder_outlier(encoder_type: int, encoder_param: int, outlier: int) -> int:
    """Final outlier threshold an initialized encoder uses, or raises.

    Mirrors reference cmp_encoder_init (encoder.c:185-224): ZERO derives the
    optimal outlier; both modes clamp to the representable upper bound; a
    result of 0 is a parameter error.  ``encoder_type``: 1 = GOLOMB_ZERO,
    2 = GOLOMB_MULTI.
    """
    from ..format.errors import CmpError, CmpErrorCode  # local to avoid cycle

    if encoder_type == 0:  # UNCOMPRESSED
        return 0
    if encoder_param < CMP_MIN_GOLOMB_PAR or encoder_param > CMP_MAX_GOLOMB_PAR:
        raise CmpError(CmpErrorCode.PARAMS_INVALID, "Golomb parameter out of range")
    if encoder_type == 1:  # GOLOMB_ZERO
        out = golomb_optimal_outlier_zero(encoder_param, CMP_NUM_BITS_PER_SAMPLE)
    elif encoder_type == 2:  # GOLOMB_MULTI
        out = outlier
    else:
        raise CmpError(CmpErrorCode.PARAMS_INVALID, "unknown encoder type")
    out = min(out, golomb_upper_bound(encoder_param, encoder_type == 2))
    if out == 0:
        raise CmpError(CmpErrorCode.PARAMS_INVALID, "outlier parameter invalid")
    return out


def max_compressed_payload_size(packed_size: int) -> int:
    """Worst-case payload bytes (reference cmp_encoder_max_compressed_size,
    encoder.c:381-386): ceil(n_samples * 48 bits / 8)."""
    n_samples = div_round_up(packed_size * 8, CMP_NUM_BITS_PER_SAMPLE)
    return div_round_up(n_samples * CMP_MAX_BITS_PER_SAMPLE, 8)
