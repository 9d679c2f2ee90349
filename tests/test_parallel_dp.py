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
