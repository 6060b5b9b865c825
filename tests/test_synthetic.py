"""Synthetic fixture generator: determinism, physical consistency, and
agreement between the stored GT map and on-device rasterization of the stored
points (the L1→L2 contract, SURVEY.md §7 step 1)."""

import numpy as np
import jax.numpy as jnp

from radar_depth_tpu.data import SyntheticNuScenes, SampleSpec
from radar_depth_tpu.data.schema import validate_sample
from radar_depth_tpu.ops import radar_to_depth_map, rasterize_min_depth, project_points

SPEC = SampleSpec(height=112, width=200, lidar_points=8192, num_sweeps=3)


def test_deterministic_and_valid():
    ds1 = SyntheticNuScenes(4, spec=SPEC, seed=7)
    ds2 = SyntheticNuScenes(4, spec=SPEC, seed=7)
    s1, s2 = ds1[2], ds2[2]
    validate_sample(s1, SPEC)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k])
    s3 = SyntheticNuScenes(4, spec=SPEC, seed=8)[2]
    assert not np.array_equal(s3["image"], s1["image"])


def test_day_night_attribute():
    """Deterministic day/night split tags (paper reports splits separately,
    SURVEY.md §6): stable across instances, night images are darker, geometry
    (GT/radar) identical to the day rendering of the same scene."""
    from radar_depth_tpu.data.synthetic import SceneConfig

    ds = SyntheticNuScenes(64, spec=SPEC, seed=3)
    tags = [ds.sample_tag(i) for i in range(64)]
    assert tags == [SyntheticNuScenes(64, spec=SPEC, seed=3).sample_tag(i)
                    for i in range(64)]
    assert {"day", "night"} == set(tags), "both splits must occur at n=64"

    night_i = tags.index("night")
    s_night = ds[night_i]
    # same scene forced to day: only the image differs
    day_ds = SyntheticNuScenes(
        64, spec=SPEC, seed=3,
        scene=SceneConfig(night_frac=0.0))
    s_day = day_ds[night_i]
    assert s_night["image"].mean() < 0.5 * s_day["image"].mean()
    for k in ("lidar_depth", "radar_points", "radar_transform", "intrinsics"):
        np.testing.assert_array_equal(s_night[k], s_day[k])


def test_gt_depth_matches_rasterized_lidar_points():
    ds = SyntheticNuScenes(2, spec=SPEC, seed=1)
    s = ds[0]
    uv, z = project_points(jnp.asarray(s["lidar_points"]), jnp.asarray(s["intrinsics"]))
    got = np.asarray(
        rasterize_min_depth(uv, z, jnp.asarray(s["lidar_valid"]),
                            SPEC.height, SPEC.width,
                            min_depth=SPEC.min_depth, max_depth=SPEC.max_depth)
    )
    # Stored map was built by the numpy oracle from the exact same points.
    np.testing.assert_allclose(got, s["lidar_depth"], atol=1e-5)
    assert (s["lidar_depth"] > 0).mean() > 0.02  # plausibly dense


def test_radar_projects_into_image_and_correlates_with_gt():
    ds = SyntheticNuScenes(2, spec=SPEC, seed=3)
    s = ds[0]
    radar_map = np.asarray(radar_to_depth_map(
        jnp.asarray(s["radar_points"]), jnp.asarray(s["radar_valid"]),
        jnp.asarray(s["radar_transform"]), jnp.asarray(s["intrinsics"]),
        SPEC.height, SPEC.width, max_depth=SPEC.max_depth,
    ))
    n_radar = (radar_map > 0).sum()
    assert n_radar >= 10, f"too few radar pixels: {n_radar}"
    # Multi-sweep accumulation must land *more* points than a single sweep.
    single = np.asarray(radar_to_depth_map(
        jnp.asarray(s["radar_points"][:1]), jnp.asarray(s["radar_valid"][:1]),
        jnp.asarray(s["radar_transform"][:1]), jnp.asarray(s["intrinsics"]),
        SPEC.height, SPEC.width, max_depth=SPEC.max_depth,
    ))
    assert n_radar > (single > 0).sum()
    # Radar depths should be within scene range.
    vals = radar_map[radar_map > 0]
    assert vals.min() > 0.5 and vals.max() < SPEC.max_depth


def test_radar_pathologies_severity():
    """The enriched radar model (VERDICT r2 #2) must deliver substantially
    more corrupt radar pixels than the r2-era benign config — the population
    the two-stage filter exists to reject. 'Corrupt' = rasterized radar depth
    disagreeing with the true scene surface by >2 m AND >15%."""
    import jax.numpy as jnp

    from radar_depth_tpu.data.synthetic import SceneConfig
    from radar_depth_tpu.ops.preprocess import _radar_uvz, _raster

    spec = SampleSpec(height=112, width=200, num_sweeps=3)
    benign = SceneConfig(radar_azim_sigma=0.0, radar_multipath_frac=0.0,
                         radar_clutter_per_object=0.0, sweep_miscal_yaw=0.0,
                         sweep_miscal_trans=0.0)

    def corrupt_count(scene):
        ds = SyntheticNuScenes(4, spec=spec, scene=scene, seed=1)
        bad = tot = 0
        for i in range(4):
            s = ds[i]
            batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in s.items()}
            rmap = np.asarray(
                _raster(*_radar_uvz(batch, spec), spec))[0, :, :, 0]
            rng = np.random.default_rng(
                np.random.SeedSequence([1, i, 0x52414452]))
            world = ds._make_world(rng)
            K = s["intrinsics"]
            v, u = np.nonzero(rmap > 0)
            z = rmap[v, u]
            dirs = np.stack([(u + 0.5 - K[0, 2]) / K[0, 0],
                             (v + 0.5 - K[1, 2]) / K[1, 1],
                             np.ones_like(z)], -1)
            true = ds._ray_depth(dirs.astype(np.float64), world)
            true = np.where(np.isfinite(true), true, 200.0)
            err = np.abs(z - true)
            bad += ((err > 2.0) & (err / np.maximum(true, 1e-3) > 0.15)).sum()
            tot += len(z)
        return bad, tot

    bad_e, tot_e = corrupt_count(SceneConfig())
    bad_b, tot_b = corrupt_count(benign)
    assert bad_e >= 3 * max(bad_b, 1), (bad_e, bad_b)
    assert bad_e / tot_e > 0.4, f"enriched outlier frac too low: {bad_e/tot_e}"


def test_night_severity_destroys_information():
    """night_severity=0 reproduces the mild model bit-exactly (r3 datasets
    unchanged); severity ramps DESTROY image information monotonically
    (shadow crush → more clipped-to-zero pixels; blur+noise → lower
    correlation with the severity-0 night render). Geometry (radar/lidar)
    stays untouched at every severity."""
    from radar_depth_tpu.data.synthetic import SceneConfig, SyntheticNuScenes

    spec = SampleSpec(height=96, width=160, num_sweeps=2)

    def night_sample(severity, seed=11):
        cfg = SceneConfig(night_frac=1.0, night_severity=severity)
        ds = SyntheticNuScenes(4, spec=spec, seed=seed, scene=cfg)
        assert ds.is_night(0)
        return ds[0]

    mild_a, mild_b = night_sample(0.0), night_sample(0.0)
    np.testing.assert_array_equal(mild_a["image"], mild_b["image"])  # determ.

    img0 = night_sample(0.0)["image"].astype(np.float32)
    zeros, corrs = [], []
    for s in (0.0, 0.5, 1.0):
        smp = night_sample(s)
        img = smp["image"].astype(np.float32)
        zeros.append(float((img == 0).mean()))
        corrs.append(float(np.corrcoef(img.ravel(), img0.ravel())[0, 1]))
        # lighting-invariant sensors are untouched by severity
        np.testing.assert_array_equal(smp["radar_points"],
                                      night_sample(0.0)["radar_points"])
        np.testing.assert_array_equal(smp["lidar_depth"],
                                      night_sample(0.0)["lidar_depth"])
    assert zeros[0] < zeros[1] < zeros[2]  # shadow crush grows
    assert corrs[0] > 0.99  # s=0 is the same render
    assert corrs[1] > corrs[2]  # information loss grows with severity
    assert corrs[2] < 0.8  # severity 1 is a materially different image


def test_generate_dataset_val_night_frac(tmp_path):
    """generate_dataset.py --val-night-frac: the VAL split's night fraction
    is overridden (powers the night eval split, VERDICT r3 #2) while train
    keeps the default distribution; tags sidecars record the attribute."""
    import json
    import subprocess
    import sys
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "ds"
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/generate_dataset.py"),
         "--out", str(out), "--num-train", "8", "--num-val", "24",
         "--height", "64", "--width", "96", "--sweeps", "2", "--seed", "0",
         "--night-frac", "0.0", "--val-night-frac", "1.0"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    tags = {}
    for split in ("train", "val"):
        tags[split] = []
        for p in sorted(glob.glob(str(out / split / "*.tags.json"))):
            with open(p) as f:
                tags[split] += json.load(f)
    assert len(tags["train"]) == 8 and len(tags["val"]) == 24
    assert all(t == "day" for t in tags["train"])  # --night-frac 0.0
    assert all(t == "night" for t in tags["val"])  # --val-night-frac 1.0
