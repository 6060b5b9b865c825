"""Pallas kernels vs oracles (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_depth_tpu.ops import rasterize_min_depth
from radar_depth_tpu.ops.pallas_kernels import (
    fused_scale_bias_relu,
    fused_scale_bias_relu_reference,
    pallas_available,
    points_to_linear,
    rasterize_min_depth_pallas,
)

pytestmark = pytest.mark.skipif(not pallas_available(), reason="no pallas")

RNG = np.random.default_rng(7)


def test_pallas_raster_matches_xla_scatter():
    b, p, h, w = 3, 700, 40, 64
    uv = jnp.asarray(RNG.uniform(-5, 70, size=(b, p, 2)).astype(np.float32))
    z = jnp.asarray(RNG.uniform(-2, 90, size=(b, p)).astype(np.float32))
    valid = jnp.asarray(RNG.uniform(size=(b, p)) > 0.2)
    want = np.asarray(rasterize_min_depth(uv, z, valid, h, w,
                                          min_depth=0.0, max_depth=80.0))
    lin, zf = points_to_linear(uv, z, valid, h, w, 0.0, 80.0)
    got = np.asarray(rasterize_min_depth_pallas(lin, zf, h, w, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_raster_empty_and_dupes():
    h, w = 16, 32
    lin = jnp.asarray([[-1, -1, 5, 5, 5, 511]], dtype=jnp.int32)
    z = jnp.asarray([[np.inf, np.inf, 3.0, 1.5, 9.0, 2.0]], dtype=jnp.float32)
    got = np.asarray(rasterize_min_depth_pallas(lin, z, h, w, interpret=True))
    assert got[0].sum() == 1.5 + 2.0
    assert got[0, 0, 5] == 1.5
    assert got[0, 511 // w, 511 % w] == 2.0


def test_fused_scale_bias_relu():
    x = jnp.asarray(RNG.normal(size=(2, 8, 16, 32)).astype(np.float32))
    scale = jnp.asarray(RNG.normal(size=(32,)).astype(np.float32))
    bias = jnp.asarray(RNG.normal(size=(32,)).astype(np.float32))
    res = jnp.asarray(RNG.normal(size=(2, 8, 16, 32)).astype(np.float32))
    got = np.asarray(fused_scale_bias_relu(x, scale, bias, interpret=True))
    want = np.asarray(fused_scale_bias_relu_reference(x, scale, bias))
    np.testing.assert_allclose(got, want, atol=1e-6)
    got2 = np.asarray(fused_scale_bias_relu(x, scale, bias, res, interpret=True))
    want2 = np.asarray(fused_scale_bias_relu_reference(x, scale, bias, res))
    np.testing.assert_allclose(got2, want2, atol=1e-6)
