"""Fused on-device input pipeline: raw schema batch → model inputs.

This is the reference's entire L2 runtime path — pickle → transforms →
modality packing (upstream:dataloaders/dataloader.py::MyDataloader.__getitem__
+ transforms.py; SURVEY.md §3.1 host hot loop) — moved inside the jitted graph
per BASELINE.json ("batched preproc + augmentation ... on TPU mesh"). The host
only ships raw fixed-shape arrays; everything else (radar accumulation,
projection, rasterization, augmentation, normalization) is XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from radar_depth_tpu.data.schema import SampleSpec
from radar_depth_tpu.ops.augment import (
    AugmentConfig,
    apply_affine_uv,
    color_jitter,
    make_affine,
    sample_affine_params,
    warp_depths_nearest,
    warp_images_bilinear,
)
from radar_depth_tpu.ops.geometry import project_points
from radar_depth_tpu.ops.raster import (
    accumulate_sweeps,
    extend_height,
    rasterize_min_depth,
    rasterize_min_depth_sorted_xla,
)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    spec: SampleSpec = SampleSpec()
    height_extension: int = 0  # radar vertical extension (paper ablation)
    augment: AugmentConfig = AugmentConfig()
    # Inherited sparsifier flags (upstream --sparsifier/--num-samples,
    # SURVEY.md §2 C6): when set, the sparse-depth channel is SAMPLED FROM THE
    # LiDAR GT instead of radar — the sparse-to-dense NYU/KITTI-style modality.
    sparsifier: str = "none"  # none | uar | sim_stereo
    num_samples: int = 200
    # GT handling under train-time augmentation:
    #   "warp"        nearest-warp the stored LiDAR map through the affine and
    #                 divide by s — the reference's transform semantics, and
    #                 fast (no 40k-point scatter in the train step).
    #   "rerasterize" re-project the LiDAR points through the affine and
    #                 z-buffer again — geometrically exact, but XLA scatter
    #                 over ~40k points/sample is serialized and slow.
    gt_augment: str = "warp"
    # z-buffer backend (measured on TPU, scripts/exp_raster_sorted.py):
    #   "sorted"  sort-by-pixel + unique-index set — 1.5/3.7/10.9 ms at
    #             B=32, P=640/10k/40k (the sort is parallel; the unique set
    #             needs no combiner). DEFAULT.
    #   "scatter" direct scatter-min — 2.6/5.2/15.1 ms (XLA serializes the
    #             min-combiner update loop).
    raster_backend: str = "sorted"

    def __post_init__(self):
        if self.raster_backend not in ("sorted", "scatter"):
            raise ValueError(
                f"raster_backend={self.raster_backend!r}: expected 'sorted' "
                "or 'scatter'")
        if self.gt_augment not in ("warp", "rerasterize"):
            raise ValueError(
                f"gt_augment={self.gt_augment!r}: expected 'warp' or "
                "'rerasterize'")
        if self.sparsifier not in ("none", "uar", "sim_stereo"):
            raise ValueError(
                f"sparsifier={self.sparsifier!r}: expected 'none', 'uar' or "
                "'sim_stereo'")


def _radar_uvz(batch: Dict, spec: SampleSpec):
    """Accumulated multi-sweep radar → projected (uv, z, valid)."""
    pts_cam, valid = accumulate_sweeps(
        batch["radar_points"], batch["radar_valid"], batch["radar_transform"]
    )
    uv, z = project_points(pts_cam, batch["intrinsics"])
    return uv, z, valid


def _lidar_uvz(batch: Dict):
    uv, z = project_points(batch["lidar_points"], batch["intrinsics"])
    return uv, z, batch["lidar_valid"]


def _raster(uv, z, valid, spec: SampleSpec, height_extension: int = 0,
            backend: str = "sorted"):
    if height_extension > 0:
        offsets = jnp.arange(-height_extension, height_extension + 1)
        uv, z, valid = extend_height(uv, z, valid, offsets)
    fn = {"sorted": rasterize_min_depth_sorted_xla,
          "scatter": rasterize_min_depth}[backend]
    return fn(
        uv, z, valid, spec.height, spec.width,
        min_depth=spec.min_depth, max_depth=spec.max_depth,
    )[..., None]


def _apply_sparsifier(cfg: PreprocessConfig, target: jax.Array,
                      key: jax.Array) -> jax.Array:
    from radar_depth_tpu.ops.sparsify import SPARSIFIERS

    fn = SPARSIFIERS[{"uar": "uar", "sim_stereo": "sim_stereo"}[cfg.sparsifier]]
    return fn(target[..., 0], key, cfg.num_samples)[..., None]


def prepare_eval_batch(batch: Dict, cfg: PreprocessConfig,
                       key: jax.Array | None = None) -> Dict[str, jax.Array]:
    """Validation-path inputs: no augmentation (upstream val_transform is just
    resize/crop/to-tensor; our schema ships data already at working res).

    Returns {rgb (B,H,W,3) f32 in [0,1], radar (B,H,W,1), target (B,H,W,1)}.
    """
    spec = cfg.spec
    rgb = batch["image"].astype(jnp.float32) / 255.0
    target = batch["lidar_depth"][..., None].astype(jnp.float32)
    if cfg.sparsifier != "none":
        radar = _apply_sparsifier(cfg, target,
                                  key if key is not None else jax.random.PRNGKey(0))
    else:
        radar = _raster(*_radar_uvz(batch, spec), spec, cfg.height_extension,
                        cfg.raster_backend)
    return {"rgb": rgb, "radar": radar, "target": target}


def prepare_train_batch(
    batch: Dict, cfg: PreprocessConfig, key: jax.Array
) -> Dict[str, jax.Array]:
    """Training-path inputs with on-device augmentation.

    Reference semantics (upstream transforms; SURVEY.md §2 C4): per-sample
    random scale s∈[1,1.5] + rotation ±5° + hflip + color jitter; depth values
    divided by s. Here the image is warped once bilinearly; radar and LiDAR GT
    are re-projected through the same pixel affine and re-rasterized (exact —
    no nearest-neighbor smearing of sparse depth).
    """
    spec, aug = cfg.spec, cfg.augment
    if cfg.sparsifier != "none":
        # sparsified-GT modality trains without geometric augmentation of the
        # sparse channel; reuse the eval path with a fresh key per step.
        return prepare_eval_batch(batch, cfg, key)
    rgb = batch["image"].astype(jnp.float32) / 255.0
    if not aug.enabled:
        radar = _raster(*_radar_uvz(batch, spec), spec, cfg.height_extension,
                        cfg.raster_backend)
        target = (batch["lidar_depth"][..., None].astype(jnp.float32)
                  if cfg.gt_augment == "warp"
                  else _raster(*_lidar_uvz(batch), spec,
                               backend=cfg.raster_backend))
        return {"rgb": rgb, "radar": radar, "target": target}

    b = rgb.shape[0]
    scale, angle, flip, jitter = sample_affine_params(key, aug, b)
    A = make_affine(scale, angle, flip, spec.height, spec.width)

    rgb = warp_images_bilinear(rgb, A)
    rgb = color_jitter(rgb, jitter)

    def aug_raster(uv, z, valid, he):
        uv = apply_affine_uv(A, uv)
        z = z / scale[:, None]  # zoom-in by s ⇒ depth / s (reference rule)
        return _raster(uv, z, valid, spec, he, cfg.raster_backend)

    radar = aug_raster(*_radar_uvz(batch, spec), cfg.height_extension)
    if cfg.gt_augment == "warp":
        target = warp_depths_nearest(
            batch["lidar_depth"].astype(jnp.float32), A, scale)[..., None]
    else:
        target = aug_raster(*_lidar_uvz(batch), 0)
    return {"rgb": rgb, "radar": radar, "target": target}


def pack_model_inputs(
    prepared: Dict[str, jax.Array], input_kind: str, modality: str = "rgbd"
) -> Tuple:
    """Assemble the model's positional inputs from a prepared batch.

    single+rgb → (rgb,); single+rgbd → (concat(rgb, radar),); single+d →
    (radar,); late → (rgb, radar). Mirrors the reference's modality packing in
    upstream:dataloaders (SURVEY.md §3.1)."""
    rgb, radar = prepared["rgb"], prepared["radar"]
    if input_kind == "late":
        return rgb, radar
    if modality == "rgb":
        return (rgb,)
    if modality == "rgbd":
        return (jnp.concatenate([rgb, radar], axis=-1),)
    if modality == "d":
        return (radar,)
    raise ValueError(f"unknown modality {modality!r}")
