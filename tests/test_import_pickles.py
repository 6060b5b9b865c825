"""Ingestion bridge round-trip: fabricated reference-format pickles →
import_reference_pickles → packed shards → schema-valid samples that train
(VERDICT r1 missing #1; upstream:scripts/* pickle schema, SURVEY.md §1 L1→L2)."""

import os
import pickle
import sys

import numpy as np
import pytest

from radar_depth_tpu.data import schema
from radar_depth_tpu.data.packed import PackedDataset

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)

import import_reference_pickles as imp  # noqa: E402


def _fake_reference_pickle(rng, h, w, full_factor=1, radar_as_map=False):
    """Reference-style sample dict: CHW float image, dense-ish GT map, radar
    as devkit-transposed points OR a rasterized map, 3×3 K."""
    H, W = h * full_factor, w * full_factor
    img = rng.uniform(0, 1, (3, H, W)).astype(np.float32)  # CHW, [0,1]
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                 np.float32)
    gt = np.zeros((H, W), np.float32)
    n_gt = 500
    uu = rng.integers(0, W, n_gt)
    vv = rng.integers(0, H, n_gt)
    gt[vv, uu] = rng.uniform(1.0, 70.0, n_gt).astype(np.float32)

    sample = {"im": img, "depth": gt, "K": K}
    n_r = 40
    ur = rng.integers(0, W, n_r)
    vr = rng.integers(0, H, n_r)
    zr = rng.uniform(2.0, 60.0, n_r).astype(np.float32)
    if radar_as_map:
        rmap = np.zeros((H, W), np.float32)
        rmap[vr, ur] = zr
        sample["sparse_depth"] = rmap
    else:
        x = (ur + 0.5 - K[0, 2]) / K[0, 0] * zr
        y = (vr + 0.5 - K[1, 2]) / K[1, 1] * zr
        # devkit layout: (dims, N) with extra feature rows
        pc = np.zeros((18, n_r), np.float32)
        pc[0], pc[1], pc[2] = x, y, zr
        sample["radar_pc"] = pc
    return sample


def _write_pickles(tmp_path, n, h, w, **kw):
    rng = np.random.default_rng(0)
    src = tmp_path / "pickles"
    src.mkdir(exist_ok=True)
    for i in range(n):
        with open(src / f"{i:05d}.pkl", "wb") as f:
            pickle.dump(_fake_reference_pickle(rng, h, w, **kw), f)
    return src


def _run_import(src, out, h, w, extra=()):
    argv = sys.argv
    sys.argv = ["import_reference_pickles.py", "--src", str(src), "--out",
                str(out), "--height", str(h), "--width", str(w),
                "--sweeps", "2", "--val-fraction", "0.25", *extra]
    try:
        assert imp.main() == 0
    finally:
        sys.argv = argv


def test_points_pickles_roundtrip(tmp_path):
    h, w = 64, 96
    src = _write_pickles(tmp_path, 8, h, w)
    _run_import(src, tmp_path / "out", h, w)
    spec = schema.SampleSpec(height=h, width=w, num_sweeps=2)
    for split, n in (("train", 6), ("val", 2)):
        ds = PackedDataset(str(tmp_path / "out" / split))
        assert len(ds) == n
        s = ds[0]
        schema.validate_sample(s, spec)
        # radar points land in sweep 0 with identity transform and project
        # back onto integer pixels inside the image
        assert s["radar_valid"][0].sum() == 40
        assert not s["radar_valid"][1:].any()
        np.testing.assert_array_equal(s["radar_transform"][0], np.eye(4))
        pts = s["radar_points"][0][s["radar_valid"][0]]
        K = s["intrinsics"]
        u = K[0, 0] * pts[:, 0] / pts[:, 2] + K[0, 2]
        v = K[1, 1] * pts[:, 1] / pts[:, 2] + K[1, 2]
        assert ((u >= 0) & (u < w) & (v >= 0) & (v < h)).all()
        ds.close()


def test_map_fallback_and_fullres_downsample(tmp_path):
    """Map-only pickles at 2× full resolution: importer extracts points from
    the map and block-min-downsamples image/GT/K to working resolution."""
    h, w = 64, 96
    src = _write_pickles(tmp_path, 4, h, w, full_factor=2, radar_as_map=True)
    _run_import(src, tmp_path / "out", h, w,
                extra=("--key-map", "radar_map=sparse_depth"))
    spec = schema.SampleSpec(height=h, width=w, num_sweeps=2)
    ds = PackedDataset(str(tmp_path / "out" / "train"))
    s = ds[0]
    schema.validate_sample(s, spec)
    assert s["radar_valid"][0].sum() > 0
    # unprojected GT points re-rasterize onto the stored GT map exactly
    pts = s["lidar_points"][s["lidar_valid"]]
    K = s["intrinsics"]
    u = np.floor(K[0, 0] * pts[:, 0] / pts[:, 2] + K[0, 2]).astype(int)
    v = np.floor(K[1, 1] * pts[:, 1] / pts[:, 2] + K[1, 2]).astype(int)
    stored = s["lidar_depth"][v, u]
    np.testing.assert_allclose(stored, pts[:, 2], rtol=1e-5)
    ds.close()


@pytest.mark.slow
def test_imported_pickles_train_end_to_end(tmp_path):
    """The full bridge: fabricated reference pickles → packed shards →
    Trainer 1 epoch (packed dataset path, native loader)."""
    from radar_depth_tpu.config import (
        AugmentConfig, DataConfig, ModelConfig, OptimConfig, TrainConfig)
    from radar_depth_tpu.train.loop import Trainer

    h, w = 64, 96
    src = _write_pickles(tmp_path, 16, h, w)
    _run_import(src, tmp_path / "out", h, w)
    cfg = TrainConfig(
        data=DataConfig(dataset="packed", data_root=str(tmp_path / "out"),
                        height=h, width=w, num_sweeps=2),
        model=ModelConfig(arch="resnet18_latefusion", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(),
        batch_size=8, epochs=1, output_dir=str(tmp_path / "run"),
        print_freq=100, val_viz_every=1,
    )
    tr = Trainer(cfg)
    tr.fit()
    assert os.path.exists(os.path.join(cfg.output_dir, "test.csv"))
    assert os.path.exists(os.path.join(cfg.output_dir, "comparison_epoch0.png"))


def test_rehearsal_fabricator_roundtrip(tmp_path):
    """The real-scale rehearsal's fabricated reference-format pickles
    (900×1600, points + map-only variants, scene descriptions) convert
    through the production importer: schema-valid samples, tag sidecars,
    multi-shard output (scripts/rehearse_real_scale.py at unit scale)."""
    import pickle as pkl

    import rehearse_real_scale as reh

    src = tmp_path / "pickles"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i, (night, as_map) in enumerate(
            [(False, False), (True, False), (False, True), (True, True)]):
        s = reh.fabricate_sample(rng, night=night, radar_as_map=as_map)
        assert s["im"].shape == (900, 1600, 3) and s["im"].dtype == np.uint8
        with open(src / f"{i:03d}.pkl", "wb") as f:
            pkl.dump(s, f)
    _run_import(src, tmp_path / "out", 450, 800,
                extra=("--max-shard-bytes", "1"))  # force 1 sample/shard
    spec = schema.SampleSpec(height=450, width=800, num_sweeps=2)
    ds = PackedDataset(str(tmp_path / "out" / "train"))
    assert len(ds) == 3 and len(ds.paths) == 3  # multi-shard
    assert set(ds.tags) <= {"day", "night"} and "night" in ds.tags
    for i in range(3):
        schema.validate_sample(ds[i], spec)
        assert ds[i]["radar_valid"].sum() > 0
        assert (ds[i]["lidar_depth"] > 0).mean() > 0.005
    ds.close()
