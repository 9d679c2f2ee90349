"""Build/version consistency (analog of reference test_buildsetup.c +
test/get_library_version.py): the version must agree everywhere."""

import pathlib
import re

import airs_compression_tpu as act

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_version_consistency():
    assert act.__version__ == act.CMP_VERSION_STRING
    major, minor, release = map(int, act.CMP_VERSION_STRING.split("."))
    assert act.CMP_VERSION_NUMBER == major * 10000 + minor * 100 + release


def test_pyproject_version_matches():
    text = (REPO / "pyproject.toml").read_text()
    m = re.search(r'^version\s*=\s*"([^"]+)"', text, re.M)
    assert m, "no version in pyproject.toml"
    assert m.group(1) == act.__version__


def test_public_api_surface():
    """Everything the reference's installed headers expose has an analog."""
    for name in ["CmpParams", "CmpContext", "Preprocessing", "EncoderType",
                 "compress_bound", "uncompressed_bound", "cal_work_buf_size",
                 "CmpError", "CmpErrorCode", "error_message", "CmpHeader",
                 "decompress", "set_timestamp_func", "CMP_HDR_SIZE",
                 "CMP_HDR_MAX_SIZE", "CMP_CHECKSUM_SIZE",
                 "CMP_VERSION_NUMBER", "CMP_VERSION_STRING"]:
        assert hasattr(act, name), name
