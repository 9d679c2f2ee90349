"""Error-code arithmetic conformance (reference test_cmp_errors.c).

The reference encodes errors as negated uint32 codes checked with
``cmp_is_error`` (lib/common/err_private.h:24-47); the Python taxonomy
must round-trip the same wire representation so headers/tools agree.
"""

import pytest

from airs_compression_tpu.format.errors import (
    CmpError,
    CmpErrorCode,
    error_message,
    error_to_u32,
    u32_is_error,
    u32_to_error_code,
)


ALL_CODES = [c for c in CmpErrorCode
             if c not in (CmpErrorCode.NO_ERROR, CmpErrorCode.MAX_CODE)]


@pytest.mark.parametrize("code", ALL_CODES)
def test_u32_roundtrip(code):
    wire = error_to_u32(code)
    assert u32_is_error(wire)
    assert u32_to_error_code(wire) == code
    # negated-code encoding: (uint32)(-code), reference err_private.h:31
    assert wire == (0x100000000 - int(code)) & 0xFFFFFFFF


def test_payloads_are_not_errors():
    # any value below -MAX_CODE (mod 2^32) is a valid payload
    assert not u32_is_error(0)
    assert not u32_is_error(1)
    assert not u32_is_error(0xFFFFFFFF - int(CmpErrorCode.MAX_CODE))


def test_error_boundary():
    # reference: code > (uint32)(-MAX_CODE) is an error (strict), so
    # (uint32)(-MAX_CODE) itself is still a payload (err_private.h:44-47)
    assert u32_is_error(0xFFFFFFFF)
    assert u32_is_error(0x100000000 - int(CmpErrorCode.MAX_CODE) + 1)
    assert not u32_is_error(0x100000000 - int(CmpErrorCode.MAX_CODE))


@pytest.mark.parametrize("code", ALL_CODES)
def test_every_code_has_a_message(code):
    msg = error_message(code)
    assert isinstance(msg, str) and msg


def test_no_error_message():
    assert "No error" in error_message(CmpErrorCode.NO_ERROR)


def test_exception_carries_code_and_wire_value():
    err = CmpError(CmpErrorCode.DST_TOO_SMALL)
    assert err.code == CmpErrorCode.DST_TOO_SMALL
    assert u32_is_error(err.u32)
    assert u32_to_error_code(err.u32) == CmpErrorCode.DST_TOO_SMALL
    assert "small" in str(err).lower()


def test_codes_match_reference_values():
    # numeric parity with lib/cmp_errors.h:28-60
    assert CmpErrorCode.GENERIC == 1
    assert CmpErrorCode.PARAMS_INVALID == 10
    assert CmpErrorCode.DST_TOO_SMALL == 30
    assert CmpErrorCode.SRC_SIZE_WRONG == 40
    assert CmpErrorCode.WORK_BUF_TOO_SMALL == 50
    assert CmpErrorCode.HDR_CMP_SIZE_TOO_LARGE == 60
    assert CmpErrorCode.CONTEXT_INVALID == 70
    assert CmpErrorCode.INT_HDR == 100
    assert CmpErrorCode.MAX_CODE == 128
