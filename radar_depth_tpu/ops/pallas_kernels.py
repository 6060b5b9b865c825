"""Pallas TPU kernels.

Two custom kernels beyond what XLA fusion gives:

* rasterize_min_depth_pallas — the sparse-depth z-buffer as a tiled
  broadcast-min kernel. XLA lowers scatter-min as a serialized per-update loop;
  this kernel instead keeps a (1, TILE) strip of the image in VMEM/registers
  and min-reduces over point chunks with fully-vectorized VPU compares
  (P × TILE ops, no scatter at all). Deterministic by construction (min is
  order-free). Replaces the hot path of SURVEY.md §3.3's rasterization.

* fused_scale_bias_relu — inference-mode BN (+optional residual) + ReLU as one
  VMEM pass, the decoder-block epilogue (BASELINE.json "Pallas-fused
  conv-BN-ReLU ... blocks").

Both have jnp reference implementations and run under interpret mode on CPU in
tests; pallas_available() gates real-TPU usage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

TILE = 1024  # 8 sublanes × 128 lanes
POINT_CHUNK = 512


def pallas_available() -> bool:
    return _PALLAS


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _raster_kernel(lin_ref, z_ref, out_ref, *, num_chunks: int):
    """One (batch, tile) program: min z over all points falling in this tile.

    lin_ref: (1, P, 1) int32 linear pixel index (out-of-image → -1)
    z_ref:   (1, P, 1) float32 depth
    out_ref: (1, 1, 1, TILE) float32 min-depth strip (inf where empty)
    """
    t = pl.program_id(1)
    base = t * TILE
    pix = base + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)  # (1, TILE)

    def body(i, acc):
        lin_c = lin_ref[0, pl.ds(i * POINT_CHUNK, POINT_CHUNK), :]  # (CH, 1)
        z_c = z_ref[0, pl.ds(i * POINT_CHUNK, POINT_CHUNK), :]
        hit = lin_c == pix  # (CH, TILE) via broadcast
        vals = jnp.where(hit, z_c, jnp.inf)
        return jnp.minimum(acc, jnp.min(vals, axis=0, keepdims=True))

    acc = jnp.full((1, TILE), jnp.inf, jnp.float32)
    acc = jax.lax.fori_loop(0, num_chunks, body, acc)
    out_ref[0, 0, :, :] = acc


def rasterize_min_depth_pallas(
    lin: jax.Array,
    z: jax.Array,
    height: int,
    width: int,
    interpret: bool = False,
) -> jax.Array:
    """Rasterize points given precomputed linear pixel indices.

    Args:
      lin: (B, P) int32 — v*width+u per point, or -1 for invalid/out-of-range.
      z: (B, P) float32 depths (already range-filtered).
    Returns:
      (B, height, width) float32 min-depth map, 0 where empty.
    """
    b, p = lin.shape
    p_pad = _cdiv(p, POINT_CHUNK) * POINT_CHUNK
    if p_pad != p:
        lin = jnp.pad(lin, ((0, 0), (0, p_pad - p)), constant_values=-1)
        z = jnp.pad(z, ((0, 0), (0, p_pad - p)), constant_values=jnp.inf)
    hw = height * width
    ntiles = _cdiv(hw, TILE)

    kernel = functools.partial(_raster_kernel, num_chunks=p_pad // POINT_CHUNK)
    out = pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec((1, p_pad, 1), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, 1), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ntiles, 1, TILE), jnp.float32),
        interpret=interpret,
    )(lin[..., None].astype(jnp.int32), z[..., None].astype(jnp.float32))
    flat = out.reshape(b, ntiles * TILE)[:, :hw]
    depth = jnp.where(jnp.isinf(flat), 0.0, flat)
    return depth.reshape(b, height, width)


def points_to_linear(
    uv: jax.Array, z: jax.Array, valid: jax.Array,
    height: int, width: int, min_depth: float, max_depth: float,
) -> tuple:
    """Shared front half of rasterization: floor-bin + bounds/range filter →
    (lin, z) ready for the broadcast kernel (invalid → -1). Binning rule
    lives in ops.raster.bin_points, shared with every backend."""
    from radar_depth_tpu.ops.raster import bin_points

    lin, zf, _ = bin_points(uv, z, valid, height, width, min_depth, max_depth,
                            invalid_lin=-1)
    return lin, zf


# ------------------------------------------------- sorted tile-partitioned


def _raster_sorted_kernel(starts_ref, lin_ref, z_ref, out_ref, *,
                          ntiles: int, rpt: int):
    """One program per batch element; in-kernel loop over pixel tiles.

    Points arrive SORTED by linear pixel index and packed as (PR, 128) VMEM
    rows; ``starts_ref`` (SMEM, scalar-prefetched) holds the searchsorted
    tile boundaries, so tile t only touches its own packed point rows —
    total compare work is P × TILE instead of the broadcast kernel's P × HW
    (VERDICT r1 #6 / NOTES open item #2).

    lin_ref/z_ref: (1, PR, 128); out_ref: (1, ntiles*rpt, 128);
    starts_ref: (B, ntiles+1) int32.
    """
    b = pl.program_id(0)

    def tile_body(t, carry):
        s = starts_ref[b, t]
        e = starts_ref[b, t + 1]
        pix = (
            t * (rpt * 128)
            + jax.lax.broadcasted_iota(jnp.int32, (rpt, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (rpt, 128), 1)
        )

        def row_body(pr, acc):
            lin_row = lin_ref[0, pl.ds(pr, 1), :]  # (1, 128)
            z_row = z_ref[0, pl.ds(pr, 1), :]
            lin3 = jnp.transpose(lin_row)[:, :, None]  # points → sublanes
            z3 = jnp.transpose(z_row)[:, :, None]
            # (128 points, rpt, 128 pixels): a point of a neighboring tile
            # can never equal one of this tile's pixel ids, so boundary
            # packed rows shared between tiles need no masking.
            vals = jnp.where(lin3 == pix[None], z3, jnp.inf)
            return jnp.minimum(acc, jnp.min(vals, axis=0))

        acc = jnp.full((rpt, 128), jnp.inf, jnp.float32)
        r0 = s // 128
        r1 = jnp.where(e > s, (e - 1) // 128 + 1, r0)
        acc = jax.lax.fori_loop(r0, r1, row_body, acc)
        out_ref[0, pl.ds(t * rpt, rpt), :] = acc
        return carry

    jax.lax.fori_loop(0, ntiles, tile_body, 0)


def rasterize_min_depth_pallas_sorted(
    lin_sorted: jax.Array,
    z_sorted: jax.Array,
    height: int,
    width: int,
    tile_rows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Sorted + searchsorted tile-partitioned rasterizer.

    Args:
      lin_sorted, z_sorted: (B, P) from ops.raster.sort_points_by_pixel —
        linear pixel indices ascending, invalid points at sentinel 2^30.
      tile_rows: pixel tile height in 128-lane rows (tile = tile_rows*128 px).

    Returns (B, height, width) float32 min-depth map, 0 where empty.
    """
    b, p = lin_sorted.shape
    pr = _cdiv(p, 128)
    p_pad = pr * 128
    if p_pad != p:
        lin_sorted = jnp.pad(lin_sorted, ((0, 0), (0, p_pad - p)),
                             constant_values=1 << 30)
        z_sorted = jnp.pad(z_sorted, ((0, 0), (0, p_pad - p)),
                           constant_values=jnp.inf)
    hw = height * width
    ntiles = _cdiv(_cdiv(hw, 128), tile_rows)
    rows = ntiles * tile_rows
    boundaries = (jnp.arange(ntiles + 1, dtype=jnp.int32) * (tile_rows * 128))
    starts = jax.vmap(
        lambda l: jnp.searchsorted(l, boundaries, side="left")
    )(lin_sorted).astype(jnp.int32)

    kernel = functools.partial(_raster_sorted_kernel, ntiles=ntiles,
                               rpt=tile_rows)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, pr, 128), lambda i, starts: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pr, 128), lambda i, starts: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, 128),
                                   lambda i, starts: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), jnp.float32),
        interpret=interpret,
    )(
        starts,
        lin_sorted.reshape(b, pr, 128).astype(jnp.int32),
        z_sorted.reshape(b, pr, 128).astype(jnp.float32),
    )
    flat = out.reshape(b, rows * 128)[:, :hw]
    depth = jnp.where(jnp.isinf(flat), 0.0, flat)
    return depth.reshape(b, height, width)


# ------------------------------------------------------------------ epilogue


def _scale_bias_relu_kernel(x_ref, scale_ref, bias_ref, out_ref):
    out_ref[...] = jnp.maximum(x_ref[...] * scale_ref[...] + bias_ref[...], 0.0)


def _scale_bias_add_relu_kernel(x_ref, scale_ref, bias_ref, res_ref, out_ref):
    out_ref[...] = jnp.maximum(
        x_ref[...] * scale_ref[...] + bias_ref[...] + res_ref[...], 0.0
    )


def fused_scale_bias_relu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    residual: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Inference-mode BN epilogue: relu(x*scale + bias [+ residual]) in one
    VMEM pass. x: (..., C) NHWC; scale/bias: (C,) folded BN parameters
    (scale = gamma/sqrt(var+eps), bias = beta - mean*scale)."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    sc = jnp.broadcast_to(scale.astype(x.dtype), x2.shape)
    bi = jnp.broadcast_to(bias.astype(x.dtype), x2.shape)
    if residual is None:
        out = pl.pallas_call(
            _scale_bias_relu_kernel,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2, sc, bi)
    else:
        out = pl.pallas_call(
            _scale_bias_add_relu_kernel,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2, sc, bi, residual.reshape(-1, c))
    return out.reshape(shape)


def fused_scale_bias_relu_reference(x, scale, bias, residual=None):
    y = x * scale + bias
    if residual is not None:
        y = y + residual
    return jnp.maximum(y, 0.0)
