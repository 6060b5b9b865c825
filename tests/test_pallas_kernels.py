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
    rasterize_min_depth_pallas_sorted,
)
from radar_depth_tpu.ops.raster import (
    rasterize_min_depth_sorted_xla,
    sort_points_by_pixel,
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


def _random_points(b, p, h, w, seed=11, spread=1.4):
    rng = np.random.default_rng(seed)
    uv = np.stack([rng.uniform(-5, w * spread, size=(b, p)),
                   rng.uniform(-5, h * spread, size=(b, p))],
                  axis=-1).astype(np.float32)
    z = rng.uniform(-2, 90, size=(b, p)).astype(np.float32)
    valid = rng.uniform(size=(b, p)) > 0.15
    return jnp.asarray(uv), jnp.asarray(z), jnp.asarray(valid)


def test_sorted_xla_raster_matches_scatter():
    b, p, h, w = 3, 900, 40, 64
    uv, z, valid = _random_points(b, p, h, w)
    want = np.asarray(rasterize_min_depth(uv, z, valid, h, w,
                                          min_depth=0.0, max_depth=80.0))
    got = np.asarray(rasterize_min_depth_sorted_xla(uv, z, valid, h, w,
                                                    min_depth=0.0,
                                                    max_depth=80.0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p,tile_rows", [(700, 8), (2000, 4), (130, 16)])
def test_pallas_sorted_raster_matches_scatter(p, tile_rows):
    b, h, w = 2, 37, 61  # deliberately not multiples of the tile size
    uv, z, valid = _random_points(b, p, h, w, seed=p)
    want = np.asarray(rasterize_min_depth(uv, z, valid, h, w,
                                          min_depth=0.0, max_depth=80.0))
    lin_s, z_s = sort_points_by_pixel(uv, z, valid, h, w, 0.0, 80.0)
    got = np.asarray(rasterize_min_depth_pallas_sorted(
        lin_s, z_s, h, w, tile_rows=tile_rows, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_sorted_raster_empty_and_dense():
    """All-invalid batch element + a batch element where every point lands in
    one pixel (worst-case run length)."""
    h, w = 16, 32
    p = 256
    uv = np.zeros((2, p, 2), np.float32)
    uv[1, :, 0] = 7.3
    uv[1, :, 1] = 2.9
    z = np.full((2, p), 5.0, np.float32)
    z[1] = np.linspace(80, 1, p)
    valid = np.zeros((2, p), bool)
    valid[1] = True
    lin_s, z_s = sort_points_by_pixel(jnp.asarray(uv), jnp.asarray(z),
                                      jnp.asarray(valid), h, w, 0.0, 100.0)
    got = np.asarray(rasterize_min_depth_pallas_sorted(lin_s, z_s, h, w,
                                                       interpret=True))
    assert got[0].sum() == 0.0
    assert got[1, 2, 7] == np.float32(1.0)
    assert got[1].sum() == np.float32(1.0)


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
