"""Dense→sparse depth samplers (upstream:dataloaders/dense_to_sparse.py;
SURVEY.md §2 C6 — inherited from sparse-to-dense.pytorch).

In radar_depth the radar itself is the sparse source, but the upstream
sparsifiers remain part of the API surface (--sparsifier / --num-samples /
--max-depth flags): UniformSampling draws ~num_samples valid pixels uniformly;
SimulatedStereo keeps pixels on a disparity-quantized grid emulating a stereo
matcher's output density.

Jittable re-design: masks are drawn with explicit jax.random keys; the number
of kept pixels is binomial around num_samples (matching upstream, which uses a
per-pixel Bernoulli with p = num_samples / n_valid — not exactly n draws).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sampling(depth: jax.Array, key: jax.Array, num_samples: int
                     ) -> jax.Array:
    """Keep each valid pixel with p = num_samples / n_valid
    (upstream:dense_to_sparse.py::UniformSampling.dense_to_sparse)."""
    valid = depth > 0
    n_valid = jnp.sum(valid, axis=(-2, -1), keepdims=True).astype(jnp.float32)
    p = jnp.minimum(1.0, num_samples / jnp.maximum(n_valid, 1.0))
    keep = jax.random.uniform(key, depth.shape) < p
    return jnp.where(valid & keep, depth, 0.0)


def simulated_stereo(depth: jax.Array, key: jax.Array, num_samples: int,
                     max_depth: float = 80.0, min_depth: float = 1.0,
                     dilate_iterations: int = 0) -> jax.Array:
    """Quantize inverse depth into bands and keep one contour sample set per
    band, emulating stereo-matcher density (upstream:dense_to_sparse.py::
    SimulatedStereo — pixels near disparity-level boundaries survive).

    Bands span [1/max_depth, 1/min_depth] in inverse depth (disparity levels);
    depths outside the range clamp to the boundary bands (ADVICE r1 low #3)."""
    valid = depth > 0
    safe = jnp.where(valid, depth, max_depth)
    inv = 1.0 / jnp.maximum(safe, 1e-3)
    inv_min = 1.0 / max_depth
    inv_max = 1.0 / max(min_depth, 1e-3)
    n_levels = 64
    band = jnp.floor((inv - inv_min) / (inv_max - inv_min + 1e-6) * n_levels)
    band = jnp.clip(band, 0, n_levels - 1)
    # contour pixels: band differs from a neighbor
    down = jnp.roll(band, 1, axis=-2)
    right = jnp.roll(band, 1, axis=-1)
    contour = (band != down) | (band != right)
    candidates = valid & contour
    n_cand = jnp.sum(candidates, axis=(-2, -1), keepdims=True).astype(jnp.float32)
    p = jnp.minimum(1.0, num_samples / jnp.maximum(n_cand, 1.0))
    keep = jax.random.uniform(key, depth.shape) < p
    return jnp.where(candidates & keep, depth, 0.0)


SPARSIFIERS = {"uar": uniform_sampling, "sim_stereo": simulated_stereo}
