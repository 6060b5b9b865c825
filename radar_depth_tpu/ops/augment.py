"""On-device train-time augmentation (reference transforms, SURVEY.md §2 C4:
upstream:dataloaders/transforms.py — random scale, rotation, horizontal flip,
color jitter, with depth values divided by the scale factor).

TPU-first re-design: instead of per-sample PIL/numpy warps in DataLoader
workers, each sample gets one 2×3 pixel-space affine A = F·T(c)·R(θ)·S(s)·
T(−c) (flip ∘ rotate+scale about the image center). The RGB image is warped
once by bilinear gather; sparse depth channels are NEVER interpolated —
projected points are pushed through A and re-rasterized, which is exact where
the reference's nearest-neighbor warp is approximate. Randomness is explicit
`jax.random` keys, so augmentation is reproducible by construction (SURVEY.md
§5 "race detection": determinism by design).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Reference train_transform knobs (upstream:dataloaders/transforms.py +
    the nuScenes dataset's train_transform [M on exact ranges])."""

    scale_range: Tuple[float, float] = (1.0, 1.5)
    rotation_deg: float = 5.0
    hflip_prob: float = 0.5
    jitter: float = 0.4  # brightness/contrast/saturation multiplier range
    enabled: bool = True


def sample_affine_params(key: jax.Array, cfg: AugmentConfig, batch: int):
    """Draw per-sample augmentation parameters: (scale, angle_rad, flip, jitter3)."""
    ks, ka, kf, kj = jax.random.split(key, 4)
    scale = jax.random.uniform(
        ks, (batch,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    angle = jax.random.uniform(
        ka, (batch,),
        minval=-cfg.rotation_deg * jnp.pi / 180,
        maxval=cfg.rotation_deg * jnp.pi / 180,
    )
    flip = jax.random.uniform(kf, (batch,)) < cfg.hflip_prob
    jitter = jax.random.uniform(
        kj, (batch, 3), minval=1.0 - cfg.jitter, maxval=1.0 + cfg.jitter
    )
    return scale, angle, flip, jitter


def make_affine(
    scale: jax.Array, angle: jax.Array, flip: jax.Array, height: int, width: int
) -> jax.Array:
    """Forward raster-space affine (..., 2, 3): uv_out = A @ [u, v, 1].

    Coordinate convention: *raster* coordinates, where pixel bin j covers
    [j, j+1) — matching the rasterizer's floor-binning — so bin centers sit at
    j+0.5 and the image center is (W/2, H/2). Under this convention an exact
    bin-level horizontal flip (np.fliplr of the rasterized map, the reference's
    HorizontalFlip) is u → W − u. Image warping converts to its own
    integer-center convention via a half-pixel conjugation
    (see warp_image_bilinear).

    Rotation+scale about the image center, then optional horizontal flip.
    Batched over leading dims of scale/angle/flip.
    """
    cx, cy = width / 2.0, height / 2.0
    c, s = jnp.cos(angle) * scale, jnp.sin(angle) * scale
    # R·S about center: [c, -s, cx - c*cx + s*cy; s, c, cy - s*cx - c*cy]
    a02 = cx - c * cx + s * cy
    a12 = cy - s * cx - c * cy
    sign = jnp.where(flip, -1.0, 1.0)
    off = jnp.where(flip, float(width), 0.0)
    # F ∘ (R·S): row0 scaled by sign plus offset.
    row0 = jnp.stack([sign * c, sign * (-s), sign * a02 + off], axis=-1)
    row1 = jnp.stack([s, c, a12], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def invert_affine(A: jax.Array) -> jax.Array:
    """Invert (..., 2, 3) affines analytically."""
    a, b, tx = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    c, d, ty = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def apply_affine_uv(A: jax.Array, uv: jax.Array) -> jax.Array:
    """Apply (..., 2, 3) affine to (..., P, 2) pixel coords."""
    return (
        jnp.einsum("...ij,...pj->...pi", A[..., :2], uv,
                   precision=jax.lax.Precision.HIGHEST)
        + A[..., None, :, 2]
    )


def _src_coords(A: jax.Array, h: int, w: int, half_pixel: bool):
    """Back-projected source coordinates for every output pixel.
    A: (B, 2, 3) forward affines → (su, sv) each (B, H, W). A lives in raster
    coords (bin centers at j+0.5); image sampling puts pixel centers at
    integers — conjugate by the half-pixel shift when half_pixel."""
    Ainv = invert_affine(A)
    vs, us = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
    off = 0.5 if half_pixel else 0.0
    su = (Ainv[:, 0, 0, None, None] * us + Ainv[:, 0, 1, None, None] * vs
          + Ainv[:, 0, 2, None, None] - off)
    sv = (Ainv[:, 1, 0, None, None] * us + Ainv[:, 1, 1, None, None] * vs
          + Ainv[:, 1, 2, None, None] - off)
    return su, sv


def _gather_pixels(flat: jax.Array, vi: jax.Array, ui: jax.Array,
                   h: int, w: int) -> jax.Array:
    """flat: (B, H*W, C); vi/ui: (B, H, W) int32 → (B, H*W, C), OOB = 0.
    One batched take_along_axis per tap — ~4× faster than per-sample
    map_coordinates gathers on TPU (measured; NOTES.md)."""
    b = flat.shape[0]
    ok = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    lin = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    vals = jnp.take_along_axis(flat, lin.reshape(b, h * w, 1), axis=1)
    return jnp.where(ok.reshape(b, h * w, 1), vals, 0.0)


def warp_images_bilinear(imgs: jax.Array, A: jax.Array) -> jax.Array:
    """Warp (B, H, W, C) images by (B, 2, 3) forward affines via inverse
    bilinear sampling; out-of-bounds reads 0 (black border, like the
    reference's rotation fill)."""
    b, h, w, c = imgs.shape
    su, sv = _src_coords(A, h, w, half_pixel=True)
    u0 = jnp.floor(su)
    v0 = jnp.floor(sv)
    fu = (su - u0).reshape(b, h * w, 1)
    fv = (sv - v0).reshape(b, h * w, 1)
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    flat = imgs.reshape(b, h * w, c)
    p00 = _gather_pixels(flat, v0i, u0i, h, w)
    p01 = _gather_pixels(flat, v0i, u0i + 1, h, w)
    p10 = _gather_pixels(flat, v0i + 1, u0i, h, w)
    p11 = _gather_pixels(flat, v0i + 1, u0i + 1, h, w)
    out = (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
           + p10 * (1 - fu) * fv + p11 * fu * fv)
    return out.reshape(b, h, w, c)


def warp_image_bilinear(img: jax.Array, A: jax.Array) -> jax.Array:
    """Single-image convenience wrapper over warp_images_bilinear."""
    return warp_images_bilinear(img[None], A[None])[0]


def warp_depths_nearest(depths: jax.Array, A: jax.Array, scales: jax.Array
                        ) -> jax.Array:
    """Warp (B, H, W) sparse/dense depth maps by (B, 2, 3) forward affines
    with NEAREST-neighbor sampling and divide values by the zoom factor — the
    reference's HorizontalFlip/Rotate/Resize semantics on depth maps
    (upstream:dataloaders/transforms.py applies the geometric transform to the
    depth image with nearest interpolation and scales values by 1/s).

    Out-of-bounds reads 0 (no return)."""
    b, h, w = depths.shape
    su, sv = _src_coords(A, h, w, half_pixel=False)
    ui = jnp.floor(su).astype(jnp.int32)
    vi = jnp.floor(sv).astype(jnp.int32)
    flat = depths.reshape(b, h * w, 1)
    vals = _gather_pixels(flat, vi, ui, h, w).reshape(b, h, w)
    return vals / scales[:, None, None]


def warp_depth_nearest(depth: jax.Array, A: jax.Array, scale: jax.Array
                       ) -> jax.Array:
    """Single-map convenience wrapper over warp_depths_nearest."""
    return warp_depths_nearest(depth[None], A[None],
                               jnp.asarray(scale)[None])[0]


def color_jitter(img: jax.Array, factors: jax.Array) -> jax.Array:
    """Multiplicative brightness/contrast/saturation jitter on (..., H, W, 3)
    float images in [0, 1] (torchvision ColorJitter-style; upstream transform).
    factors: (..., 3) = (brightness, contrast, saturation)."""
    b = factors[..., 0][..., None, None, None]
    c = factors[..., 1][..., None, None, None]
    s = factors[..., 2][..., None, None, None]
    img = img * b
    mean = jnp.mean(img, axis=(-3, -2, -1), keepdims=True)
    img = mean + (img - mean) * c
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = gray + (img - gray) * s
    return jnp.clip(img, 0.0, 1.0)
