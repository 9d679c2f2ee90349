"""Native C++ host core: parity with the pure-Python paths."""

import numpy as np
import pytest

from airs_compression_tpu import native
from airs_compression_tpu.engine import host
from airs_compression_tpu.utils.xxh32 import CHECKSUM_SEED, _xxh32_py

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def test_xxh32_parity():
    rng = np.random.default_rng(0)
    lib = native.get_lib()
    for n in [0, 1, 3, 4, 15, 16, 17, 63, 1024, 4097]:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        got = lib.airs_xxh32(data, len(data), 12345)
        assert got == _xxh32_py(data, 12345), f"n={n}"


def test_checksum_u16_parity():
    rng = np.random.default_rng(1)
    for n in [1, 2, 7, 8, 9, 15, 16, 100, 4096]:
        samples = rng.integers(0, 65536, n).astype(np.uint16)
        got = native.checksum_u16(samples, CHECKSUM_SEED)
        be = samples.astype(">u2").tobytes()
        assert got == _xxh32_py(be, CHECKSUM_SEED), f"n={n}"


@pytest.mark.parametrize("enc_type,g_par,outlier", [
    (0, 0, 0), (1, 1, 16), (1, 10, 165), (1, 0xFFFF, 0xFFFF0),
    (2, 1, 24), (2, 7, 100), (2, 0xFFFF, 0xFFFE9),
])
def test_encode_decode_parity(enc_type, g_par, outlier):
    rng = np.random.default_rng(enc_type * 131 + g_par)
    residuals = rng.integers(-32768, 32768, 500).astype(np.int16)
    # python reference pack
    codes, lens = host.encode_codewords(residuals, enc_type, g_par, outlier)
    expected = host.pack_codes(codes, lens)
    # native pack
    buf = bytearray(500 * 6 + 16)
    end = native.encode_residuals(residuals, enc_type, g_par, outlier, buf, 0)
    assert end == int(lens.sum())
    assert bytes(buf[: (end + 7) // 8]) == expected
    # native decode back
    vals, dec_end = native.decode_mapped(bytes(buf), 0, 500, enc_type,
                                         g_par, outlier)
    assert dec_end == end
    if enc_type == 0:
        np.testing.assert_array_equal(vals.view(np.int16), residuals)
    else:
        np.testing.assert_array_equal(host.zigzag_unmap(vals), residuals)


def test_decode_malformed_fails_cleanly():
    vals, end = native.decode_mapped(b"\xff" * 8, 0, 5, 1, 1, 16)
    assert vals is None and end == -1


def test_scatter_rows_matches_python():
    from airs_compression_tpu import native

    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    B, stride = 37, 96
    lens = rng.integers(0, stride + 1, B)
    rows = [rng.integers(0, 256, l).astype(np.uint8).tobytes()
            for l in lens]
    out = np.zeros((B, stride), np.uint8)
    native.scatter_rows(b"".join(rows), lens, stride, out)
    ref = np.zeros((B, stride), np.uint8)
    for b, r in enumerate(rows):
        ref[b, : lens[b]] = np.frombuffer(r, np.uint8)
    np.testing.assert_array_equal(out, ref)
