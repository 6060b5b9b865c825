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


def warp_image_bilinear(img: jax.Array, A: jax.Array) -> jax.Array:
    """Warp one (H, W, C) image by forward affine A via inverse bilinear
    sampling; out-of-bounds reads 0 (black border, like the reference's
    rotation fill)."""
    h, w, _ = img.shape
    Ainv = invert_affine(A)
    # A lives in raster coords (bin centers at j+0.5); image sampling puts
    # pixel centers at integers — conjugate by the half-pixel shift.
    vs, us = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
    src_u = Ainv[0, 0] * us + Ainv[0, 1] * vs + Ainv[0, 2] - 0.5
    src_v = Ainv[1, 0] * us + Ainv[1, 1] * vs + Ainv[1, 2] - 0.5
    coords = jnp.stack([src_v, src_u], axis=0)  # (2, H, W): row, col

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, list(coords), order=1, cval=0.0)

    return jnp.stack([sample_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


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
