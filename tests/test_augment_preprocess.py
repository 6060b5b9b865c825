"""On-device augmentation + fused input pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from radar_depth_tpu.data import SyntheticNuScenes, SampleSpec
from radar_depth_tpu.ops.augment import (
    AugmentConfig,
    apply_affine_uv,
    invert_affine,
    make_affine,
    warp_image_bilinear,
    color_jitter,
)
from radar_depth_tpu.ops.preprocess import (
    PreprocessConfig,
    prepare_eval_batch,
    prepare_train_batch,
    pack_model_inputs,
)

SPEC = SampleSpec(height=96, width=160, lidar_points=4096, num_sweeps=3)
RNG = np.random.default_rng(5)


def test_affine_identity_and_inverse():
    A = make_affine(jnp.asarray([1.0]), jnp.asarray([0.0]),
                    jnp.asarray([False]), 96, 160)
    uv = jnp.asarray(RNG.uniform(0, 100, (1, 7, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(apply_affine_uv(A, uv)), np.asarray(uv), atol=1e-4)
    A2 = make_affine(jnp.asarray([1.3]), jnp.asarray([0.1]), jnp.asarray([True]), 96, 160)
    round_trip = apply_affine_uv(invert_affine(A2), apply_affine_uv(A2, uv))
    np.testing.assert_allclose(np.asarray(round_trip), np.asarray(uv), atol=1e-3)


def test_affine_center_fixed_point_and_flip():
    h, w = 96, 160
    # raster coords: image center is (W/2, H/2)
    c = jnp.asarray([[[w / 2.0, h / 2.0]]])
    A = make_affine(jnp.asarray([1.4]), jnp.asarray([0.08]), jnp.asarray([False]), h, w)
    np.testing.assert_allclose(np.asarray(apply_affine_uv(A, c)), np.asarray(c), atol=1e-3)
    # flip maps bin-center j+0.5 → W-j-0.5, i.e. bin j → bin W-1-j exactly
    Af = make_affine(jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([True]), h, w)
    uv = jnp.asarray([[[0.5, 10.0]]])
    np.testing.assert_allclose(np.asarray(apply_affine_uv(Af, uv))[0, 0], [w - 0.5, 10.0], atol=1e-4)


def test_warp_image_identity_and_flip():
    img = jnp.asarray(RNG.uniform(size=(12, 16, 3)).astype(np.float32))
    A_id = make_affine(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(False), 12, 16)
    np.testing.assert_allclose(np.asarray(warp_image_bilinear(img, A_id)),
                               np.asarray(img), atol=1e-5)
    A_f = make_affine(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(True), 12, 16)
    np.testing.assert_allclose(np.asarray(warp_image_bilinear(img, A_f)),
                               np.asarray(img)[:, ::-1], atol=1e-5)


def test_color_jitter_identity():
    img = jnp.asarray(RNG.uniform(size=(2, 8, 8, 3)).astype(np.float32))
    out = color_jitter(img, jnp.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def _batch():
    return {k: jnp.asarray(v) for k, v in
            SyntheticNuScenes(4, spec=SPEC, seed=11).batch(range(2)).items()}


def test_prepare_eval_batch_shapes_and_target_parity():
    cfg = PreprocessConfig(spec=SPEC)
    out = prepare_eval_batch(_batch(), cfg)
    assert out["rgb"].shape == (2, 96, 160, 3)
    assert out["radar"].shape == (2, 96, 160, 1)
    assert out["target"].shape == (2, 96, 160, 1)
    assert float(out["rgb"].max()) <= 1.0
    assert (np.asarray(out["radar"]) > 0).sum() > 0


def test_prepare_train_batch_augmented_consistency():
    """Flip-only augmentation: rgb, radar, and target must all flip together."""
    cfg = PreprocessConfig(
        spec=SPEC,
        augment=AugmentConfig(scale_range=(1.0, 1.0), rotation_deg=0.0,
                              hflip_prob=1.0, jitter=0.0),
    )
    batch = _batch()
    out = prepare_train_batch(batch, cfg, jax.random.PRNGKey(0))
    ref = prepare_eval_batch(batch, cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"])[:, :, ::-1], atol=1e-4)
    # Sparse maps: flipped rasterization == rasterized flip (u → W-1-u exactly)
    np.testing.assert_allclose(np.asarray(out["radar"]), np.asarray(ref["radar"])[:, :, ::-1], atol=1e-4)
    want_target = np.asarray(ref["target"])[:, :, ::-1]
    got_target = np.asarray(out["target"])
    # target is re-rasterized from points; identical to flipped stored map
    np.testing.assert_allclose(got_target, want_target, atol=1e-4)


def test_prepare_train_batch_scale_divides_depth():
    """One isolated LiDAR point: under scale s its raster position follows the
    affine and its depth value is divided by s (reference rule depth /= s).
    Uses the exact re-rasterization GT mode."""
    s = 1.25
    cfg = PreprocessConfig(
        spec=SPEC,
        augment=AugmentConfig(scale_range=(s, s), rotation_deg=0.0,
                              hflip_prob=0.0, jitter=0.0),
        gt_augment="rerasterize",
    )
    batch = {k: np.zeros_like(np.asarray(v)) for k, v in _batch().items()}
    K = np.array([[100.0, 0, 80], [0, 100.0, 48], [0, 0, 1]], np.float32)
    batch["intrinsics"][:] = K
    z = 20.0
    # point projecting to u=100.25, v=30.5
    batch["lidar_points"][:, 0] = [(100.25 - 80) / 100 * z, (30.5 - 48) / 100 * z, z]
    batch["lidar_valid"][:, 0] = True
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = prepare_train_batch(batch, cfg, jax.random.PRNGKey(1))
    t = np.asarray(out["target"])[0, ..., 0]
    ys, xs = np.nonzero(t)
    assert len(ys) == 1
    # affine about center (W/2, H/2) = (80, 48): u' = 80 + s*(u-80)
    exp_u = 80 + s * (100.25 - 80)
    exp_v = 48 + s * (30.5 - 48)
    assert xs[0] == int(exp_u) and ys[0] == int(exp_v), (xs, ys, exp_u, exp_v)
    np.testing.assert_allclose(t[ys[0], xs[0]], z / s, rtol=1e-5)


def test_pack_model_inputs():
    cfg = PreprocessConfig(spec=SPEC)
    out = prepare_eval_batch(_batch(), cfg)
    (rgbd,) = pack_model_inputs(out, "single", "rgbd")
    assert rgbd.shape[-1] == 4
    rgb, radar = pack_model_inputs(out, "late")
    assert rgb.shape[-1] == 3 and radar.shape[-1] == 1
    (d,) = pack_model_inputs(out, "single", "d")
    assert d.shape[-1] == 1


def test_gt_warp_mode_flip_and_scale():
    """Default gt_augment="warp" (reference nearest-warp semantics): pure flip
    is an exact bin flip of the stored map; zoom divides values by s (nearest
    warp may duplicate a sparse pixel — upstream behavior)."""
    batch = _batch()
    cfg = PreprocessConfig(
        spec=SPEC,
        augment=AugmentConfig(scale_range=(1.0, 1.0), rotation_deg=0.0,
                              hflip_prob=1.0, jitter=0.0),
    )
    out = prepare_train_batch(batch, cfg, jax.random.PRNGKey(0))
    want = np.asarray(batch["lidar_depth"])[:, :, ::-1, None]
    np.testing.assert_allclose(np.asarray(out["target"]), want, atol=1e-5)

    sfac = 1.25
    cfg2 = PreprocessConfig(
        spec=SPEC,
        augment=AugmentConfig(scale_range=(sfac, sfac), rotation_deg=0.0,
                              hflip_prob=0.0, jitter=0.0),
    )
    out2 = prepare_train_batch(batch, cfg2, jax.random.PRNGKey(1))
    t = np.asarray(out2["target"])
    src = np.asarray(batch["lidar_depth"])
    vals = np.unique(t[t > 0])
    src_vals = set(np.round(np.unique(src[src > 0]) / sfac, 4))
    # every warped value is a stored value divided by s
    assert all(np.round(v, 4) in src_vals for v in vals[:50])
