"""Data-parallel sharded encode: correctness across mesh sizes.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py). Performance
scaling is measured by tools/dp_scaling.py; here we pin down that the
sharded path is bit-identical to the single-device encode at every mesh
width, including per-block state (sizes, fallback flags).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from airs_compression_tpu.format.params import (
    CmpParams,
    EncoderType,
    Preprocessing,
)
from airs_compression_tpu.ops.encode import (
    encode_blocks_device,
    make_pass_config,
    worst_case_words,
)
from airs_compression_tpu.parallel.dp import encode_blocks_sharded
from airs_compression_tpu.parallel.mesh import make_mesh

B, N = 32, 256


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(11)
    frames = ((1100 + rng.normal(0, 8, (B, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    params = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                       primary_encoder_type=EncoderType.GOLOMB_ZERO,
                       primary_encoder_param=4,
                       uncompressed_fallback_enabled=True)
    cfg = make_pass_config(params, False, True)
    fb = make_pass_config(
        CmpParams(primary_preprocessing=Preprocessing.NONE,
                  primary_encoder_type=EncoderType.UNCOMPRESSED),
        False, True)
    nw = worst_case_words(cfg, N)
    x = jnp.asarray(frames.view(np.int16), jnp.int32)
    zb = jnp.zeros((B,), jnp.int32)
    zu = jnp.zeros((B,), jnp.uint32)
    ref = encode_blocks_device(cfg, fb, x, x, zb, zu, zu, zu, nw)
    return cfg, fb, nw, x, zb, zu, jax.tree_util.tree_map(np.asarray, ref)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_encode_matches_single_device(workload, n_dev):
    if jax.device_count() < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    cfg, fb, nw, x, zb, zu, (w_ref, s_ref, f_ref) = workload
    mesh = make_mesh(n_dev)
    w, s, f = encode_blocks_sharded(mesh, cfg, fb, x, x, zb, zu, zu, zu,
                                    n_words=nw)
    np.testing.assert_array_equal(np.asarray(w), w_ref)
    np.testing.assert_array_equal(np.asarray(s), s_ref)
    np.testing.assert_array_equal(np.asarray(f), f_ref)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_decode_matches_single_device(workload, n_dev):
    """Decode-side DP: sharded decode == single-device decode == input."""
    from airs_compression_tpu.parallel.dp import decode_blocks_sharded
    from airs_compression_tpu.ops.decode import decode_blocks_device

    cfg, fb, nw, x, zb, zu, (ref_w, ref_s, ref_fb) = workload
    words = jnp.asarray(ref_w)
    mesh = make_mesh(n_dev)
    s_sh, e_sh = decode_blocks_sharded(mesh, cfg, words, x, N)
    s_ref, e_ref = decode_blocks_device(cfg, words, x, N)
    np.testing.assert_array_equal(np.asarray(s_sh), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(e_sh), np.asarray(e_ref))
    # none of the workload blocks fell back -> decode must equal input
    assert not ref_fb.any()
    np.testing.assert_array_equal(np.asarray(s_sh), np.asarray(x))


def test_sharded_decode_dynamic_params():
    """Adaptive (per-lane g) streams decode data-parallel too."""
    import dataclasses

    from airs_compression_tpu.engine.context import (
        CmpContext,
        set_timestamp_func,
    )
    from airs_compression_tpu.ops.encode import PassConfig
    from airs_compression_tpu.parallel.dp import decode_blocks_sharded

    rng = np.random.default_rng(12)
    base = CmpParams(primary_preprocessing=Preprocessing.DIFF,
                     primary_encoder_type=EncoderType.GOLOMB_ZERO,
                     primary_encoder_param=4)
    gs = [1, 2, 4, 8] * (B // 4)
    frames = ((1100 + rng.normal(0, 5, (B, N))).astype(np.int64)
              & 0xFFFF).astype(np.uint16)
    raws = []
    set_timestamp_func(lambda: (0, 0))
    try:
        for g, f in zip(gs, frames):
            p = dataclasses.replace(base, primary_encoder_param=g)
            raws.append(CmpContext(p).compress_u16(f))
    finally:
        set_timestamp_func(None)
    n_words = max((len(r) + 3) // 4 for r in raws)
    w_np = np.zeros((B, n_words), np.uint32)
    for i, raw in enumerate(raws):
        raw = raw + b"\0" * (n_words * 4 - len(raw))
        w_np[i] = np.frombuffer(raw, ">u4").astype(np.uint32)
    cfg = PassConfig(int(Preprocessing.DIFF),
                     int(EncoderType.GOLOMB_ZERO), 8, 0, False, 0, False,
                     True)
    mesh = make_mesh(4)
    s, _ = decode_blocks_sharded(mesh, cfg, jnp.asarray(w_np),
                                 jnp.zeros((B, N), jnp.int32), N,
                                 g_dyn=np.asarray(gs, np.uint32))
    np.testing.assert_array_equal(
        np.asarray(s).astype(np.uint16), frames)
