"""Adversarial-input robustness (verify-skill probes, SURVEY.md §7 hard part
#2 "padded buffers without silent truncation"): all-invalid masks, NaN/inf
garbage in padding slots, boundary coordinates, behind-camera points — the
full preproc/train path must stay finite and drop exactly what the sequential
reference loops would drop."""

import numpy as np
import jax
import jax.numpy as jnp

from radar_depth_tpu.ops.raster import (
    rasterize_min_depth,
    rasterize_min_depth_sorted_xla,
)

BACKENDS = [rasterize_min_depth, rasterize_min_depth_sorted_xla]


def test_all_invalid_points_give_zero_map_no_nan():
    uv = jnp.asarray(np.full((2, 64, 2), np.nan, np.float32))
    z = jnp.asarray(np.full((2, 64), np.nan, np.float32))
    valid = jnp.zeros((2, 64), bool)
    for fn in BACKENDS:
        out = np.asarray(fn(uv, z, valid, 16, 24, 0.0, 80.0))
        assert out.shape == (2, 16, 24)
        np.testing.assert_array_equal(out, 0.0)


def test_nan_in_padding_does_not_leak():
    """Garbage in padding slots must not corrupt valid pixels (padding is
    routed through the same sort/scatter as real points)."""
    uv = np.full((1, 8, 2), np.nan, np.float32)
    z = np.full((1, 8), np.inf, np.float32)
    valid = np.zeros((1, 8), bool)
    uv[0, 3] = (5.5, 2.5)
    z[0, 3] = 10.0
    valid[0, 3] = True
    for fn in BACKENDS:
        out = np.asarray(fn(jnp.asarray(uv), jnp.asarray(z),
                            jnp.asarray(valid), 8, 8, 0.0, 80.0))
        assert out[0, 2, 5] == 10.0
        assert out.sum() == 10.0


def test_boundary_and_behind_camera_points():
    """u/v exactly at the image edge rasterize into the edge pixel; u/v at
    width/height fall outside; z<=min_depth (behind camera / at origin) is
    dropped — matching the sequential loop's half-open bounds."""
    h, w = 10, 12
    uv = np.array([[[0.0, 0.0],            # top-left corner pixel
                    [w - 1e-3, h - 1e-3],  # bottom-right corner pixel
                    [float(w), 4.0],       # u == width → out
                    [4.0, float(h)],       # v == height → out
                    [-1e-3, 4.0],          # u < 0 → out
                    [6.0, 6.0],            # behind camera
                    [7.0, 7.0]]], np.float32)  # beyond max_depth
    z = np.array([[5.0, 6.0, 7.0, 7.0, 7.0, -3.0, 99.0]], np.float32)
    valid = np.ones((1, 7), bool)
    for fn in BACKENDS:
        out = np.asarray(fn(jnp.asarray(uv), jnp.asarray(z),
                            jnp.asarray(valid), h, w, 0.0, 80.0))
        assert out[0, 0, 0] == 5.0
        assert out[0, h - 1, w - 1] == 6.0
        assert out.sum() == 11.0


def test_empty_radar_batch_full_step_finite(tmp_path):
    """A batch whose radar sweeps are ALL invalid must flow through the whole
    jitted train step (preproc → two-stage forward → backward → SGD) with a
    finite loss and finite gradients-applied params."""
    from tests.test_train import tiny_config
    from radar_depth_tpu.parallel import shard_batch
    from radar_depth_tpu.train.loop import Trainer, iterate_batches

    cfg = tiny_config(tmp_path, arch="resnet18_multistage")
    tr = Trainer(cfg)
    batch = next(iterate_batches(tr.train_ds, cfg.batch_size, False, 0, True))
    batch = dict(batch)
    batch["radar_valid"] = np.zeros_like(batch["radar_valid"])
    batch = shard_batch(batch, tr.mesh)
    state, sums = tr._train_step(tr.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(sums["loss"]))
    leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.isfinite(leaf).all()
    tr.close()
