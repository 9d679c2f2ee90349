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


def test_scatter_rows_memsets_tails():
    """scatter_rows zero-fills row tails — callers pass uninitialized
    buffers (np.empty), so stale bytes must never survive."""
    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(6)
    B, stride = 9, 64
    lens = rng.integers(0, stride + 1, B)
    rows = [rng.integers(0, 256, l).astype(np.uint8).tobytes()
            for l in lens]
    out = np.full((B, stride), 0xAB, np.uint8)  # poisoned buffer
    native.scatter_rows(b"".join(rows), lens, stride, out)
    for b, r in enumerate(rows):
        np.testing.assert_array_equal(out[b, : lens[b]],
                                      np.frombuffer(r, np.uint8))
        assert (out[b, lens[b]:] == 0).all(), b


def test_gather_rows_inverts_scatter():
    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    B, stride = 23, 80
    lens = rng.integers(0, stride + 1, B)
    rows = [rng.integers(0, 256, l).astype(np.uint8).tobytes()
            for l in lens]
    buf = np.empty((B, stride), np.uint8)
    native.scatter_rows(b"".join(rows), lens, stride, buf)
    assert native.gather_rows(buf, lens, stride) == b"".join(rows)
    # lens exceeding the stride clamp (defensive contract)
    assert native.gather_rows(buf, np.full(B, stride + 50), stride) \
        == buf.tobytes()


def test_stage_parse_tiny_csize_clamps_trailer():
    """A header whose compressed_size is below the trailer width must
    parse without reading out of bounds (the decode end-position guard
    rejects the block later) — mirrors the numpy path's np.clip."""
    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")
    B, stride = 2, 32
    buf = np.zeros((B, stride), np.uint8)
    for b in range(B):
        # valid-enough header: version, csize=2 (< 4!), osize=2*4,
        # seq=1, method: prep=1 (DIFF), cs=1, enc=1; ext g=3
        buf[b, 0] = 0x80
        buf[b, 2:5] = (0, 0, 2)
        buf[b, 5:8] = (0, 0, 8)
        buf[b, 14] = 1
        buf[b, 15] = (1 << 4) | (1 << 3) | 1
        buf[b, 17:19] = (0, 3)
    lens = np.full(B, stride, np.int64)
    res = native.stage_parse(buf, lens, 4)
    assert len(res) == 9  # parsed, not failed
    prep, enc, cs, seq, g, outlier, csize, stored, uniform = res
    assert list(csize) == [2, 2] and list(g) == [3, 3]
    assert uniform is True
    buf2 = buf.copy()
    buf2[1, 17:19] = (0, 5)  # different encoder parameter
    res2 = native.stage_parse(buf2, lens, 4)
    assert len(res2) == 9 and res2[-1] is False
