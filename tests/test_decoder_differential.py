"""Differential fuzz: native C++ host decoder vs pure-Python host decoder.

The host decode path has two interchangeable backends — the ctypes-wrapped
C++ core (native/airs_host.cpp) and the pure-Python bit reader
(engine/host.py).  On *valid* streams both are oracle-tested elsewhere;
this module drives both explicitly over the SAME malformed corpora and
asserts identical observable behavior: same samples on success, same
CmpError code on failure, and no crash/OOB either way.  (The reference
never had to meet this bar — it has no decoder at all,
programs/airspacecli.c:421-423.)
"""

import numpy as np
import pytest

from airs_compression_tpu import (
    CmpContext,
    CmpError,
    CmpParams,
    EncoderType,
    Preprocessing,
)
from airs_compression_tpu import native
from airs_compression_tpu.engine.host import decode_block

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason="native library unavailable; nothing to differentiate")


def _decode_both(monkeypatch, blob):
    """Run decode_block on both backends -> (outcome, payload).

    outcome is "ok" with the samples, or "err" with the error code.
    """
    results = []
    for force_python in (False, True):
        with monkeypatch.context() as m:
            if force_python:
                m.setattr(native, "native_available", lambda: False)
            try:
                samples, hdr, size = decode_block(blob)
                results.append(("ok", samples.tobytes(), size))
            except CmpError as e:
                results.append(("err", e.code, None))
    return results


CONFIGS = [
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=4),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=5, primary_encoder_outlier=80,
              checksum_enabled=True),
    CmpParams(primary_preprocessing=Preprocessing.NONE,
              primary_encoder_type=EncoderType.UNCOMPRESSED),
]


def _frames():
    rng = np.random.default_rng(0)
    out = []
    for p in CONFIGS:
        data = (1100 + rng.normal(0, 9, 96)).astype(np.int64).astype(
            np.uint16)
        out.append(bytes(CmpContext(p).compress_u16(data)))
    return out


@pytest.mark.parametrize("fi", range(len(CONFIGS)))
def test_valid_frames_agree(monkeypatch, fi):
    blob = _frames()[fi]
    a, b = _decode_both(monkeypatch, blob)
    assert a == b
    assert a[0] == "ok"


def test_truncations_agree(monkeypatch):
    for blob in _frames():
        for cut in list(range(0, 24)) + [len(blob) - 5, len(blob) - 1]:
            a, b = _decode_both(monkeypatch, blob[:cut])
            assert a == b, f"cut={cut}: native {a} vs python {b}"


def test_single_byte_flips_agree(monkeypatch):
    rng = np.random.default_rng(1)
    for blob in _frames():
        for _ in range(80):
            pos = int(rng.integers(0, len(blob)))
            bit = 1 << int(rng.integers(0, 8))
            mutated = bytearray(blob)
            mutated[pos] ^= bit
            a, b = _decode_both(monkeypatch, bytes(mutated))
            assert a == b, f"flip@{pos}: native {a} vs python {b}"


def test_garbage_payload_after_valid_header_agrees(monkeypatch):
    rng = np.random.default_rng(2)
    for blob in _frames():
        hdr = blob[:22]
        for _ in range(30):
            body = rng.integers(0, 256, len(blob) - 22).astype(np.uint8)
            a, b = _decode_both(monkeypatch, hdr + body.tobytes())
            assert a == b


def test_random_garbage_agrees(monkeypatch):
    rng = np.random.default_rng(3)
    for _ in range(60):
        n = int(rng.integers(1, 200))
        blob = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        a, b = _decode_both(monkeypatch, blob)
        assert a == b


def test_chunked_device_decode_equals_host_on_random_streams(monkeypatch):
    """Property fuzz: decompress_chunked == host decompress on random
    multi-block streams (mixed configs, sizes, fallback, checksum)."""
    import dataclasses

    from airs_compression_tpu import decompress
    from airs_compression_tpu.models.chunked import decompress_chunked

    rng = np.random.default_rng(7)
    base = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                     primary_encoder_type=EncoderType.GOLOMB_ZERO,
                     primary_encoder_param=2,
                     uncompressed_fallback_enabled=True,
                     checksum_enabled=True)
    for trial in range(6):
        n_blocks = int(rng.integers(2, 9))
        n = int(rng.integers(4, 40)) * 16
        parts = []
        expect = []
        for b in range(n_blocks):
            g = int(rng.integers(1, 9))
            p = dataclasses.replace(base, primary_encoder_param=g)
            if rng.integers(0, 3) == 0:  # noise block -> fallback
                data = rng.integers(0, 1 << 16, n).astype(np.uint16)
            else:
                data = ((1100 + rng.normal(0, g, n)).astype(np.int64)
                        & 0xFFFF).astype(np.uint16)
            parts.append(CmpContext(p).compress_u16(data))
            expect.append(data)
        stream = b"".join(parts)
        got = decompress_chunked(stream, batch=4)
        ref, _ = decompress(stream)
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got, np.concatenate(expect))
