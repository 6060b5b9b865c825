"""Sparsifier tests (SURVEY.md §2 C6)."""

import numpy as np
import jax
import jax.numpy as jnp

from radar_depth_tpu.ops.sparsify import uniform_sampling, simulated_stereo


def test_uniform_sampling_density_and_subset():
    rng = np.random.default_rng(0)
    depth = rng.uniform(1, 50, size=(64, 64)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.3] = 0.0
    out = np.asarray(uniform_sampling(jnp.asarray(depth), jax.random.PRNGKey(0), 200))
    kept = (out > 0).sum()
    assert 120 < kept < 280, kept  # binomial around 200
    # strict subset with identical values
    assert ((out == 0) | (out == depth)).all()
    assert not (out[depth == 0] > 0).any()


def test_uniform_sampling_caps_at_all_valid():
    depth = np.full((8, 8), 5.0, np.float32)
    out = np.asarray(uniform_sampling(jnp.asarray(depth), jax.random.PRNGKey(1), 10_000))
    np.testing.assert_array_equal(out, depth)


def test_simulated_stereo_subset_and_sparser():
    rng = np.random.default_rng(1)
    # piecewise-constant depth (contours exist)
    depth = np.kron(rng.uniform(2, 60, (8, 8)), np.ones((8, 8))).astype(np.float32)
    out = np.asarray(simulated_stereo(jnp.asarray(depth), jax.random.PRNGKey(2), 100))
    assert ((out == 0) | (out == depth)).all()
    assert 0 < (out > 0).sum() <= 150
