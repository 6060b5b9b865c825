"""Predictor (serving-style API) round-trip test."""

import pytest
import numpy as np

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.inference import Predictor
from radar_depth_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow


def test_predictor_from_run(tmp_path):
    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16, num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(),
        augment=AugmentConfig(),
        batch_size=8,
        epochs=1,
        output_dir=str(tmp_path),
        print_freq=100,
    )
    Trainer(cfg).fit()

    p = Predictor.from_run(str(tmp_path), cfg=cfg)
    batch = SyntheticNuScenes(4, spec=cfg.data.sample_spec(), seed=5).batch(range(4))
    depth = p.predict(batch)
    assert depth.shape == (4, 64, 96)
    assert np.isfinite(depth).all()
    metrics = p.evaluate(batch)
    assert metrics["count"] == 4
    assert np.isfinite(metrics["rmse"]) and metrics["rmse"] > 0

    # streaming API: pipelined results identical to one-shot predict
    ds = SyntheticNuScenes(12, spec=cfg.data.sample_spec(), seed=6)
    stream_batches = [ds.batch(range(i, i + 4)) for i in (0, 4, 8)]
    got = list(p.predict_stream(iter(stream_batches)))
    assert len(got) == 3
    for b, out in zip(stream_batches, got):
        np.testing.assert_array_equal(out, p.predict(b))

    # serving export: the StableHLO artifact (weights + preproc baked in)
    # reproduces Predictor.predict without model code or checkpoints
    from radar_depth_tpu.inference import load_serving

    artifact = str(tmp_path / "serving.stablehlo")
    nbytes = p.export_serving(artifact, batch_size=4)
    assert nbytes > 1_000_000  # weights are embedded
    serve = load_serving(artifact)
    np.testing.assert_allclose(serve(batch), p.predict(batch),
                               rtol=1e-6, atol=1e-6)


def test_predict_tiles_non_pow2_batches(tmp_path):
    """predict() pads/tiles requests to pow2 chunks (NOTES.md B>128 cliff:
    non-pow2 batch dims are padded per-op by XLA and collapse throughput;
    arbitrary request sizes must not compile their own programs). Values
    must equal the per-sample results (per-sample independence)."""
    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(),
        augment=AugmentConfig(),
        batch_size=8,
        epochs=1,
        output_dir=str(tmp_path),
        print_freq=100,
    )
    Trainer(cfg).fit()
    p = Predictor.from_run(str(tmp_path), cfg=cfg)

    ds = SyntheticNuScenes(8, spec=cfg.data.sample_spec(), seed=7)
    full = ds.batch(range(8))
    want = p.predict(full)  # B=8: one pow2 tile, the old behavior

    # B=5 → one tile of 8 with 3 repeated-padding rows, sliced off
    five = ds.batch(range(5))
    got = p.predict(five)
    assert got.shape == (5, 64, 96)
    np.testing.assert_array_equal(got, want[:5])

    # max_tile caps the chunk: B=8 at max_tile=4 → two B=4 programs
    got_tiled = p.predict(full, max_tile=4)
    np.testing.assert_allclose(got_tiled, want, rtol=2e-5, atol=2e-5)
