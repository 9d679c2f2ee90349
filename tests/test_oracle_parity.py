"""Differential tests: our codec vs the reference C library (ground truth).

The reference at /root/reference is compiled unmodified into a shared
library (tests/oracle/build.py) and driven through ctypes.  Both codecs get
deterministic, synchronized timestamp stubs, so outputs must be IDENTICAL
BYTES — headers, identifiers, payloads, checksums — across randomized
configurations, data distributions, multi-pass chains, and fallback/error
paths.  Every stream the oracle produces must also round-trip through our
decoder (the capability the reference lacks).
"""


import numpy as np
import pytest

from airs_compression_tpu import (
    CmpContext,
    CmpError,
    CmpParams,
    EncoderType,
    Preprocessing,
    decompress,
    set_timestamp_func,
)
from airs_compression_tpu.format.dtypes import CmpType

from oracle.wrapper import Oracle, OracleContext


@pytest.fixture(scope="module")
def oracle():
    return Oracle()


class _PyTimestamp:
    def __init__(self):
        self.counter = 0

    def __call__(self):
        c = self.counter
        self.counter += 1
        return (c >> 16) & 0xFFFFFFFF, c & 0xFFFF


@pytest.fixture()
def synced_time(oracle):
    """Synchronize our timestamp source with the oracle's stub."""
    stub = _PyTimestamp()
    set_timestamp_func(stub)
    oracle.reset_timestamps(0)
    stub.counter = 0
    yield stub
    set_timestamp_func(None)


def _frames(rng, n_frames, n_samples, kind):
    out = []
    for _ in range(n_frames):
        if kind == "smooth":
            f = (1100 + rng.normal(0, 6, n_samples)).astype(np.int64)
        elif kind == "noise":
            f = rng.integers(0, 65536, n_samples)
        elif kind == "constant":
            f = np.full(n_samples, int(rng.integers(0, 65536)))
        elif kind == "spiky":
            f = (1000 + rng.normal(0, 3, n_samples)).astype(np.int64)
            hot = rng.integers(0, n_samples, max(1, n_samples // 50))
            f[hot] = rng.integers(0, 65536, hot.size)
        else:  # extremes
            f = rng.choice([0, 1, 0x7FFF, 0x8000, 0xFFFF, 0xFFFE], n_samples)
        out.append((f & 0xFFFF).astype(np.uint16))
    return out


CONFIGS = [
    CmpParams(),
    CmpParams(checksum_enabled=True),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=1),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=7, checksum_enabled=True),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=5, primary_encoder_outlier=80),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=16),
    CmpParams(primary_preprocessing=Preprocessing.NONE,
              primary_encoder_type=EncoderType.GOLOMB_MULTI,
              primary_encoder_param=0xFFFF,
              primary_encoder_outlier=0xFFFFFFFF),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=2,
              secondary_iterations=4,
              secondary_preprocessing=Preprocessing.MODEL,
              secondary_encoder_type=EncoderType.GOLOMB_MULTI,
              secondary_encoder_param=3, secondary_encoder_outlier=60,
              model_rate=10, checksum_enabled=True),
    CmpParams(primary_preprocessing=Preprocessing.NONE,
              primary_encoder_type=EncoderType.UNCOMPRESSED,
              secondary_iterations=255,
              secondary_preprocessing=Preprocessing.MODEL,
              secondary_encoder_type=EncoderType.GOLOMB_ZERO,
              secondary_encoder_param=4, model_rate=16),
    CmpParams(primary_preprocessing=Preprocessing.DIFF,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=1,
              secondary_iterations=2,
              secondary_preprocessing=Preprocessing.IWT,
              secondary_encoder_type=EncoderType.GOLOMB_MULTI,
              secondary_encoder_param=8, secondary_encoder_outlier=200),
    CmpParams(primary_preprocessing=Preprocessing.IWT,
              primary_encoder_type=EncoderType.GOLOMB_ZERO,
              primary_encoder_param=3,
              uncompressed_fallback_enabled=True, checksum_enabled=True),
]


@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
@pytest.mark.parametrize("kind", ["smooth", "noise", "spiky", "extremes"])
def test_bit_exact_u16_chains(oracle, synced_time, cfg_i, kind):
    params = CONFIGS[cfg_i]
    rng = np.random.default_rng(1000 * cfg_i + hash(kind) % 1000)
    n_samples = int(rng.integers(1, 700))
    frames = _frames(rng, 6, n_samples, kind)

    octx = OracleContext(oracle, params)
    assert octx.init_error == 0
    ours = CmpContext(params)

    stream = b""
    for f in frames:
        ref, ref_err = octx.compress(f.tobytes(), "u16")
        try:
            mine = ours.compress_u16(f)
            my_err = 0
        except CmpError as e:
            mine, my_err = None, int(e.code)
        assert my_err == ref_err, f"error mismatch: ours {my_err} ref {ref_err}"
        if ref_err == 0:
            assert mine == ref, (
                f"byte mismatch (cfg {cfg_i}, {kind}, n={n_samples}): "
                f"ours {len(mine)}B ref {len(ref)}B")
            stream += ref
    if stream:
        dec, _ = decompress(stream, CmpType.U16)
        np.testing.assert_array_equal(
            dec, np.concatenate(frames)[: dec.size].astype(np.uint16))
        assert dec.size == sum(f.size for f in frames)


@pytest.mark.parametrize("cfg_i", [2, 4, 7, 8])
def test_bit_exact_i16(oracle, synced_time, cfg_i):
    params = CONFIGS[cfg_i]
    rng = np.random.default_rng(cfg_i)
    frames = [rng.integers(-32768, 32768, 333).astype(np.int16)
              for _ in range(4)]
    octx = OracleContext(oracle, params)
    ours = CmpContext(params)
    for f in frames:
        ref, ref_err = octx.compress(f.tobytes(), "i16")
        mine = ours.compress_i16(f)
        assert ref_err == 0
        assert mine == ref
    # decode with i16 model semantics
    stream = b"".join(
        OracleContext(oracle, params).compress(f.tobytes(), "i16")[0]
        for f in [frames[0]])
    dec, _ = decompress(stream, CmpType.I16)
    np.testing.assert_array_equal(dec.view(np.int16), frames[0])


@pytest.mark.parametrize("cfg_i", [2, 7, 8])
def test_bit_exact_i16_in_i32(oracle, synced_time, cfg_i):
    params = CONFIGS[cfg_i]
    rng = np.random.default_rng(77 + cfg_i)
    frames = [rng.integers(0, 1 << 32, 128, dtype=np.uint32).view(np.int32)
              for _ in range(4)]
    octx = OracleContext(oracle, params)
    ours = CmpContext(params)
    for f in frames:
        ref, ref_err = octx.compress(f.tobytes(), "i16_in_i32")
        mine = ours.compress_i16_in_i32(f)
        assert ref_err == 0
        assert mine == ref


def test_fallback_parity(oracle, synced_time):
    """Uncompressed fallback: identical bytes AND identical context effects."""
    params = CmpParams(primary_preprocessing=Preprocessing.NONE,
                       primary_encoder_type=EncoderType.GOLOMB_ZERO,
                       primary_encoder_param=1,
                       secondary_iterations=3,
                       secondary_preprocessing=Preprocessing.MODEL,
                       secondary_encoder_type=EncoderType.GOLOMB_ZERO,
                       secondary_encoder_param=1, model_rate=8,
                       uncompressed_fallback_enabled=True)
    rng = np.random.default_rng(5)
    octx = OracleContext(oracle, params)
    ours = CmpContext(params)
    # alternate incompressible and compressible frames to exercise the
    # fallback's reset/reseed interplay with the model chain
    for i in range(8):
        if i % 2 == 0:
            f = rng.integers(0, 65536, 256).astype(np.uint16)
        else:
            f = np.full(256, 1234, dtype=np.uint16)
        ref, ref_err = octx.compress(f.tobytes(), "u16")
        mine = ours.compress_u16(f)
        assert ref_err == 0
        assert mine == ref, f"fallback divergence at frame {i}"
        assert ours.sequence_number == octx.sequence_number


def test_capacity_error_parity(oracle, synced_time):
    """DST_TOO_SMALL must fire at the same capacities and leave identical
    model state (partial updates at 64-bit flush granularity)."""
    params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                       primary_encoder_type=EncoderType.GOLOMB_ZERO,
                       primary_encoder_param=4,
                       secondary_iterations=5,
                       secondary_preprocessing=Preprocessing.MODEL,
                       secondary_encoder_type=EncoderType.GOLOMB_ZERO,
                       secondary_encoder_param=4, model_rate=4)
    rng = np.random.default_rng(9)
    f1 = rng.integers(0, 65536, 200).astype(np.uint16)
    f2 = rng.integers(0, 65536, 200).astype(np.uint16)
    for cap in [0, 8, 16, 17, 40, 64, 100, 180, 399, 400, 401, 800]:
        oracle.reset_timestamps(0)
        synced_time.counter = 0
        octx = OracleContext(oracle, params)
        ours = CmpContext(params)
        ref1, ref_err1 = octx.compress(f1.tobytes(), "u16", dst_capacity=cap)
        try:
            mine1 = ours.compress_u16(f1, dst_capacity=cap)
            my_err1 = 0
        except CmpError as e:
            mine1, my_err1 = None, int(e.code)
        assert my_err1 == ref_err1, f"cap={cap}: err {my_err1} vs {ref_err1}"
        if ref_err1 == 0:
            assert mine1 == ref1
        # second frame with ample capacity: model state divergence shows here
        ref2, ref_err2 = octx.compress(f2.tobytes(), "u16")
        try:
            mine2 = ours.compress_u16(f2)
            my_err2 = 0
        except CmpError as e:
            mine2, my_err2 = None, int(e.code)
        assert my_err2 == ref_err2
        if ref_err2 == 0:
            assert mine2 == ref2, f"model-state divergence after cap={cap}"


def test_invalid_params_parity(oracle):
    bad_params = [
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=0),
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_ZERO,
                  primary_encoder_param=0x10000),
        CmpParams(primary_encoder_type=EncoderType.GOLOMB_MULTI,
                  primary_encoder_param=5, primary_encoder_outlier=0),
        CmpParams(secondary_iterations=256),
        CmpParams(secondary_iterations=1,
                  secondary_preprocessing=Preprocessing.MODEL,
                  model_rate=17),
    ]
    for p in bad_params:
        octx = OracleContext(oracle, p)
        assert octx.init_error != 0
        with pytest.raises(CmpError) as e:
            CmpContext(p)
        assert int(e.value.code) == octx.init_error


def test_long_chain_sequence_rollover(oracle, synced_time):
    """255-iteration chain: sequence numbers, rollover, byte equality."""
    params = CONFIGS[8]
    rng = np.random.default_rng(11)
    octx = OracleContext(oracle, params)
    ours = CmpContext(params)
    f = rng.integers(0, 4096, 64).astype(np.uint16)
    for i in range(260):
        g = (f + rng.integers(-3, 4, 64)).astype(np.uint16)
        ref, err = octx.compress(g.tobytes(), "u16")
        mine = ours.compress_u16(g)
        assert err == 0 and mine == ref, f"divergence at pass {i}"
