"""Sparse-depth rasterization and multi-sweep accumulation.

TPU-native replacement for the reference's per-sample NumPy z-buffer loops
(upstream:scripts/* generation; SURVEY.md §2 C5, §3.3): points are carried as
fixed-size padded buffers with validity masks, projection + scatter-min
rasterization happen on-device inside the jitted graph, and multi-sweep
ego-motion compensation is one batched einsum instead of a Python per-sweep
loop.

Determinism note (SURVEY.md §7 hard part #1): the z-buffer is a pure min
reduction per pixel. min is commutative and associative over floats (ignoring
NaN, which we mask out), so XLA scatter-min ordering cannot change the result —
parity with a sequential NumPy loop is exact, not approximate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radar_depth_tpu.ops.geometry import project_points, se3_apply

_INF = jnp.inf


def bin_points(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    min_depth: float,
    max_depth: float,
    invalid_lin: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Floor-bin + bounds/depth-range filter shared by EVERY raster backend
    (scatter, sorted-XLA, both Pallas kernels) so the binning rule — int32
    floor, half-open [0,width)×[0,height) bounds, open (min,max) depth — can
    never drift between the paths that tests assert are bit-identical.

    Returns (lin, zf, ok): linear pixel index with ``invalid_lin`` for
    dropped points, float32 depth with +inf for dropped points, keep-mask.
    """
    u = jnp.floor(uv[..., 0]).astype(jnp.int32)
    v = jnp.floor(uv[..., 1]).astype(jnp.int32)
    ok = (
        valid
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        & (z > min_depth) & (z < max_depth)
    )
    lin = jnp.where(ok, v * width + u, jnp.int32(invalid_lin))
    zf = jnp.where(ok, z, _INF).astype(jnp.float32)
    return lin, zf, ok


def _rasterize_single(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    min_depth: float,
    max_depth: float,
) -> jax.Array:
    """Scatter-min z-buffer for one image. uv: (P, 2), z: (P,), valid: (P,)."""
    # Invalid points route to a dummy bin one past the end of the buffer.
    lin, zval, _ = bin_points(uv, z, valid, height, width, min_depth,
                              max_depth, invalid_lin=height * width)
    buf = jnp.full((height * width + 1,), _INF, dtype=jnp.float32)
    buf = buf.at[lin].min(zval, mode="drop")
    depth = buf[: height * width].reshape(height, width)
    return jnp.where(jnp.isinf(depth), 0.0, depth)


def rasterize_min_depth(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    min_depth: float = 0.0,
    max_depth: float = jnp.inf,
) -> jax.Array:
    """Rasterize projected points into a sparse depth map, keeping the minimum
    depth per pixel (z-buffer), with 0 = no return.

    Batched equivalent of the reference's per-pixel min-depth scatter over
    projected LiDAR/radar points (SURVEY.md §3.3 "rasterize: sparse radar depth
    map, min-z per pixel").

    Args:
      uv: (..., P, 2) float pixel coordinates (u=column, v=row).
      z: (..., P) depths.
      valid: (..., P) bool validity mask for padded buffers.
      height, width: static output size.
      min_depth, max_depth: keep only returns with min_depth < z < max_depth.

    Returns:
      (..., height, width) float32 sparse depth map; 0 where no valid return.
    """
    fn = functools.partial(
        _rasterize_single,
        height=height,
        width=width,
        min_depth=min_depth,
        max_depth=max_depth,
    )
    batch = uv.shape[:-2]
    if batch:
        uv2 = uv.reshape((-1,) + uv.shape[-2:])
        z2 = z.reshape((-1,) + z.shape[-1:])
        valid2 = valid.reshape((-1,) + valid.shape[-1:])
        out = jax.vmap(fn)(uv2, z2, valid2)
        return out.reshape(batch + (height, width))
    return fn(uv, z, valid)


def accumulate_sweeps(
    sweep_points: jax.Array,
    sweep_valid: jax.Array,
    T_cam_from_sensor: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Merge S radar sweeps into one camera-frame point buffer.

    Replaces the devkit's per-sweep Python loop in
    ``RadarPointCloud.from_file_multisweep`` + ego-motion chain (SURVEY.md
    §3.3) with a single batched transform. Transforms must already be the full
    cam←sensor chain per sweep (see geometry.camera_chain).

    Args:
      sweep_points: (..., S, P, 3) sensor-frame points, padded.
      sweep_valid: (..., S, P) bool mask.
      T_cam_from_sensor: (..., S, 4, 4).

    Returns:
      points_cam: (..., S*P, 3) camera-frame points.
      valid: (..., S*P) mask.
    """
    pts_cam = se3_apply(T_cam_from_sensor, sweep_points)
    batch = sweep_points.shape[:-3]
    s, p = sweep_points.shape[-3], sweep_points.shape[-2]
    return (
        pts_cam.reshape(batch + (s * p, 3)),
        sweep_valid.reshape(batch + (s * p,)),
    )


def extend_height(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    offsets: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vertically extend each projected radar return into a line segment.

    Radar has no elevation resolution; the reference paper's ablation extends
    each radar pixel vertically so the sparse channel covers plausible object
    extent (SURVEY.md §3.3 [M] "vertical height extension"). Implemented as a
    pure replication: each point is duplicated once per pixel offset in
    ``offsets`` (static length J), shifting the v (row) coordinate.

    Returns uv/z/valid with the point axis expanded from P to P*J.
    """
    j = offsets.shape[0]
    batch_p = uv.shape[:-1]
    du = jnp.zeros((j,), dtype=uv.dtype)
    dv = offsets.astype(uv.dtype)
    delta = jnp.stack([du, dv], axis=-1)  # (J, 2)
    uv_ext = uv[..., None, :] + delta  # (..., P, J, 2)
    z_ext = jnp.broadcast_to(z[..., None], z.shape + (j,))
    valid_ext = jnp.broadcast_to(valid[..., None], valid.shape + (j,))
    new_p = batch_p[-1] * j
    lead = uv.shape[:-2]
    return (
        uv_ext.reshape(lead + (new_p, 2)),
        z_ext.reshape(lead + (new_p,)),
        valid_ext.reshape(lead + (new_p,)),
    )


def radar_to_depth_map(
    sweep_points: jax.Array,
    sweep_valid: jax.Array,
    T_cam_from_sensor: jax.Array,
    K: jax.Array,
    height: int,
    width: int,
    min_depth: float = 0.0,
    max_depth: float = 100.0,
    height_extension: int = 0,
) -> jax.Array:
    """Fused multi-sweep radar → sparse depth map. The whole reference
    preprocessing stack (SURVEY.md §3.3: accumulate → ego-comp → project →
    filter → rasterize) as one jittable function.

    Args:
      sweep_points: (..., S, P, 3) sensor-frame radar points, padded.
      sweep_valid: (..., S, P) mask.
      T_cam_from_sensor: (..., S, 4, 4) full ego-motion chain per sweep.
      K: (..., 3, 3) camera intrinsics.
      height, width: output map size.
      height_extension: if > 0, extend each return ±height_extension pixels
        vertically (2*he+1 copies).

    Returns:
      (..., height, width) float32 sparse radar depth map.
    """
    pts_cam, valid = accumulate_sweeps(sweep_points, sweep_valid, T_cam_from_sensor)
    uv, z = project_points(pts_cam, K)
    if height_extension > 0:
        offsets = jnp.arange(-height_extension, height_extension + 1)
        uv, z, valid = extend_height(uv, z, valid, offsets)
    return rasterize_min_depth(
        uv, z, valid, height, width, min_depth=min_depth, max_depth=max_depth
    )


def sort_points_by_pixel(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    min_depth: float,
    max_depth: float,
) -> tuple[jax.Array, jax.Array]:
    """Front half of the sorted rasterization paths: floor-bin + filter, then
    sort points by linear pixel index (invalid → sentinel 2^30, sorts last).

    Returns (lin_sorted, z_sorted), each (..., P). Pure data-parallel XLA
    (lax.sort is a parallel bitonic network on TPU — no serialization).
    """
    lin, zf, _ = bin_points(uv, z, valid, height, width, min_depth, max_depth,
                            invalid_lin=1 << 30)
    return jax.lax.sort_key_val(lin, zf, dimension=-1)


def rasterize_min_depth_sorted_xla(
    uv: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    min_depth: float = 0.0,
    max_depth: float = jnp.inf,
) -> jax.Array:
    """Sorted + unique-scatter z-buffer: an alternative to the scatter-min
    path whose scatter has guaranteed-unique indices (XLA needs no collision
    handling, so the update loop is not forced serial by a combiner).

    Lexicographic sort by (pixel, depth) puts each pixel's minimum depth at
    the head of its run; run heads have unique pixel indices by construction,
    so a single `set`-scatter with ``unique_indices=True`` finishes the map.
    Same contract as :func:`rasterize_min_depth` (VERDICT r1 #6 exploration).
    """
    hw = height * width
    lin, zf, _ = bin_points(uv, z, valid, height, width, min_depth, max_depth,
                            invalid_lin=hw)
    # two-key lexicographic sort: by pixel, then by depth within a pixel
    lin_s, z_s = jax.lax.sort((lin, zf), dimension=-1, num_keys=2)

    def scatter_one(lin_s, z_s):
        p = lin_s.shape[0]
        head = jnp.concatenate(
            [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
        keep = head & (lin_s < hw)
        # non-heads route to distinct out-of-range bins → dropped, and every
        # index in the scatter is unique (head pixels are unique by definition)
        tgt = jnp.where(keep, lin_s, hw + jnp.arange(p, dtype=jnp.int32))
        buf = jnp.zeros((hw,), jnp.float32)
        buf = buf.at[tgt].set(z_s, mode="drop", unique_indices=True)
        return buf.reshape(height, width)

    batch = lin_s.shape[:-1]
    if batch:
        flat = jax.vmap(scatter_one)(
            lin_s.reshape((-1,) + lin_s.shape[-1:]),
            z_s.reshape((-1,) + z_s.shape[-1:]))
        return flat.reshape(batch + (height, width))
    return scatter_one(lin_s, z_s)


def depth_map_to_points(
    depth: jax.Array, max_points: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Inverse of rasterization: extract up to ``max_points`` (u, v, z) tuples
    from a sparse depth map, padded + masked. Shape-static via top_k over the
    flattened map (nonzero pixels sort first).

    Used by the two-stage model's radar re-filtering path when only a map is
    available (SURVEY.md §3.4).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    flat = depth.reshape(depth.shape[:-2] + (h * w,))
    score = jnp.where(flat > 0, 1.0, 0.0)
    _, idx = jax.lax.top_k(score, max_points)
    z = jnp.take_along_axis(flat, idx, axis=-1)
    u = (idx % w).astype(jnp.float32)
    v = (idx // w).astype(jnp.float32)
    uv = jnp.stack([u, v], axis=-1)
    return uv, z, z > 0
