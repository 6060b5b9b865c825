"""Native (C++ worker-side) train augmentation vs the jax reference
implementation in ops/augment.py — same conventions (raster coords,
half-pixel bilinear, floor-nearest, OOB=0, depth/s rule), with the geometry
folded into intrinsics/transforms (upstream:dataloaders/transforms.py
semantics, run host-side like the reference's DataLoader workers)."""

import numpy as np
import pytest

from radar_depth_tpu.data import packed, schema
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.ops.augment import (
    AugmentConfig,
    make_affine,
    warp_depths_nearest,
    warp_images_bilinear,
)

pytestmark = pytest.mark.skipif(not packed.native_available(),
                                reason="librdtp not built")

SPEC = schema.SampleSpec(height=64, width=96, num_sweeps=2)


def _make_shard(tmp_path, n=4):
    ds = SyntheticNuScenes(n, spec=SPEC, seed=3)
    path = str(tmp_path / "train" / "data.rdtp")
    packed.write_shard(path, (ds[i] for i in range(n)))
    return packed.PackedDataset(path), ds


def _load_augmented(dataset, cfg, n):
    loader = packed.NativeBatchLoader(dataset, batch_size=n, shuffle=False,
                                      seed=7, queue_depth=1, threads=1,
                                      augment=cfg)
    batch = next(loader)
    loader.close()
    return batch


def test_deterministic_params_match_jax_oracle(tmp_path):
    """Degenerate ranges pin every random parameter (s=1.3, angle=0, flip
    always, no jitter): the C++ warps must match the jax ops exactly."""
    import jax.numpy as jnp

    n = 4
    dataset, ds = _make_shard(tmp_path, n)
    cfg = AugmentConfig(scale_range=(1.3, 1.3), rotation_deg=0.0,
                        hflip_prob=1.0, jitter=0.0)
    got = _load_augmented(dataset, cfg, n)
    raw = ds.batch(range(n))

    s = np.full((n,), 1.3, np.float32)
    A = np.asarray(make_affine(jnp.asarray(s), jnp.zeros(n),
                               jnp.ones(n, bool), SPEC.height, SPEC.width))

    # rgb: bilinear warp (jitter = identity apart from [0,1] clip)
    rgb = raw["image"].astype(np.float32) / 255.0
    want_rgb = np.asarray(warp_images_bilinear(jnp.asarray(rgb), jnp.asarray(A)))
    want_u8 = np.clip(np.rint(np.clip(want_rgb, 0, 1) * 255), 0, 255)
    diff = np.abs(got["image"].astype(np.int32) - want_u8.astype(np.int32))
    assert diff.max() <= 1, f"rgb warp mismatch: max {diff.max()}"

    # lidar map: nearest warp / s
    want_d = np.asarray(warp_depths_nearest(
        jnp.asarray(raw["lidar_depth"].astype(np.float32)), jnp.asarray(A),
        jnp.asarray(s)))
    np.testing.assert_allclose(got["lidar_depth"], want_d, rtol=1e-5, atol=1e-5)

    # intrinsics: K' = A3 @ K
    A3 = np.concatenate([A, np.tile([[0, 0, 1]], (n, 1, 1))], axis=1)
    want_k = np.einsum("bij,bjk->bik", A3.astype(np.float32),
                       raw["intrinsics"])
    np.testing.assert_allclose(got["intrinsics"], want_k, rtol=1e-5, atol=1e-4)

    # transforms / points scaled by 1/s
    np.testing.assert_allclose(got["radar_transform"][:, :, :3],
                               raw["radar_transform"][:, :, :3] / 1.3,
                               rtol=1e-6)
    np.testing.assert_allclose(got["radar_transform"][:, :, 3],
                               raw["radar_transform"][:, :, 3], rtol=0)
    np.testing.assert_allclose(got["lidar_points"],
                               raw["lidar_points"] / 1.3, rtol=1e-6)
    # untouched fields
    np.testing.assert_array_equal(got["radar_points"], raw["radar_points"])
    np.testing.assert_array_equal(got["radar_valid"], raw["radar_valid"])


def test_random_params_geometrically_consistent(tmp_path):
    """With rotation enabled, recover each sample's (A, s) from the folded
    intrinsics/transforms and check (a) the GT map equals the jax nearest
    warp under the recovered params and (b) the device radar raster of the
    host-augmented sample equals the device-side augmented raster of the raw
    sample — i.e. host folding ≡ in-graph augmentation."""
    import jax
    import jax.numpy as jnp

    from radar_depth_tpu.ops.augment import apply_affine_uv
    from radar_depth_tpu.ops.preprocess import PreprocessConfig, _radar_uvz, _raster

    n = 4
    dataset, ds = _make_shard(tmp_path, n)
    cfg = AugmentConfig(scale_range=(1.0, 1.5), rotation_deg=5.0,
                        hflip_prob=0.5, jitter=0.0)
    got = _load_augmented(dataset, cfg, n)
    raw = ds.batch(range(n))

    # recover s from the transform row scaling, A from K' K^-1
    s = (np.linalg.norm(raw["radar_transform"][:, 0, 0, :3], axis=-1)
         / np.linalg.norm(got["radar_transform"][:, 0, 0, :3], axis=-1))
    A3 = np.einsum("bij,bjk->bik", got["intrinsics"],
                   np.linalg.inv(raw["intrinsics"]))
    A = A3[:, :2, :].astype(np.float32)

    want_d = np.asarray(warp_depths_nearest(
        jnp.asarray(raw["lidar_depth"].astype(np.float32)), jnp.asarray(A),
        jnp.asarray(s.astype(np.float32))))
    np.testing.assert_allclose(got["lidar_depth"], want_d, rtol=1e-4, atol=1e-4)

    # radar raster equivalence: eval-raster(host-augmented) == aug-raster(raw)
    pre = PreprocessConfig(spec=SPEC)
    batch_g = {k: jnp.asarray(v) for k, v in got.items()}
    raster_host = _raster(*_radar_uvz(batch_g, SPEC), SPEC)

    batch_r = {k: jnp.asarray(v) for k, v in raw.items()}
    uv, z, valid = _radar_uvz(batch_r, SPEC)
    uv = apply_affine_uv(jnp.asarray(A), uv)
    z = z / jnp.asarray(s.astype(np.float32))[:, None]
    raster_dev = _raster(uv, z, valid, SPEC)
    np.testing.assert_allclose(np.asarray(raster_host), np.asarray(raster_dev),
                               rtol=1e-4, atol=1e-4)


def test_augmented_stream_varies_and_is_reproducible(tmp_path):
    n = 4
    dataset, _ = _make_shard(tmp_path, n)
    cfg = AugmentConfig()
    a = _load_augmented(dataset, cfg, n)
    b = _load_augmented(dataset, cfg, n)  # same seed → identical
    np.testing.assert_array_equal(a["image"], b["image"])
    loader = packed.NativeBatchLoader(dataset, batch_size=n, shuffle=False,
                                      seed=7, queue_depth=1, threads=1,
                                      augment=cfg)
    first = next(loader)["image"].copy()
    second = next(loader)["image"].copy()  # next epoch → different params
    loader.close()
    assert not np.array_equal(first, second)
