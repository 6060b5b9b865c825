"""Self-describing run dirs (reference C10 semantics: upstream checkpoints
carry args+model, so `--evaluate CKPT` needs no arch flags — SURVEY.md §2
C10). Trainer writes config.json; parse_command --evaluate/--resume and
Predictor.from_run recover arch/data flags from it; explicit non-default CLI
flags win."""

import json
import os

import numpy as np

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    load_config,
    parse_command,
    save_config,
)


def make_cfg(tmpdir):
    return TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8, raster_backend="scatter"),
        model=ModelConfig(arch="resnet18_multistage", decoder="deconv2",
                          filter_mode="rel", rel_threshold=0.2),
        optim=OptimConfig(lr=0.02, grad_accum=2),
        augment=AugmentConfig(enabled=False),
        batch_size=8,
        epochs=1,
        metric_avg="sample",
        output_dir=str(tmpdir),
        print_freq=100,
    )


def test_config_json_round_trip(tmp_path):
    cfg = make_cfg(tmp_path)
    path = str(tmp_path / "config.json")
    save_config(cfg, path)
    assert load_config(path) == cfg


def test_load_config_version_tolerant(tmp_path):
    """config.json from another code version loads: unknown keys dropped,
    missing keys take defaults."""
    import dataclasses

    cfg = make_cfg(tmp_path)
    path = str(tmp_path / "config.json")
    save_config(cfg, path)
    with open(path) as f:
        d = json.load(f)
    d["model"]["future_knob"] = 42          # newer-version extra
    d["frobnicate"] = True                   # top-level extra
    del d["optim"]["grad_accum"]             # older-version missing
    with open(path, "w") as f:
        json.dump(d, f)
    loaded = load_config(path)
    assert loaded.model.arch == cfg.model.arch
    assert loaded.optim.grad_accum == 1      # dataclass default
    assert loaded == dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, grad_accum=1))


def test_evaluate_adopts_run_config(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    save_config(make_cfg(run), str(run / "config.json"))

    cfg = parse_command(["--evaluate", str(run)])
    assert cfg.model.arch == "resnet18_multistage"
    assert cfg.model.decoder == "deconv2"
    assert cfg.model.filter_mode == "rel"
    assert cfg.model.rel_threshold == 0.2
    assert cfg.data.height == 64 and cfg.data.width == 96
    assert cfg.data.num_sweeps == 2
    assert cfg.data.raster_backend == "scatter"
    assert cfg.batch_size == 8
    assert cfg.metric_avg == "sample"

    # explicit non-default CLI flags beat the saved config
    cfg2 = parse_command(["--evaluate", str(run), "--decoder", "upconv",
                          "--metric-avg", "batch", "-b", "4"])
    assert cfg2.model.decoder == "upconv"
    assert cfg2.batch_size == 4
    # note: batch is the parser default AND differs from the run — the saved
    # value wins only when the flag is left at its default, so here the
    # explicit --metric-avg batch sticks (it equals the default; the rule is
    # default-valued flags adopt, which this one did not need to)
    assert cfg2.model.arch == "resnet18_multistage"  # still adopted

    # runs without config.json are untouched (pre-change dirs)
    bare = tmp_path / "bare"
    bare.mkdir()
    cfg3 = parse_command(["--evaluate", str(bare)])
    assert cfg3.model.arch == "resnet18_latefusion"  # parser default


def test_resume_adopts_augment_flag(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    save_config(make_cfg(run), str(run / "config.json"))
    cfg = parse_command(["--resume", str(run)])
    assert cfg.augment.enabled is False  # run was trained without augment
    assert cfg.optim.grad_accum == 1  # optim stays CLI-driven on resume


def test_trainer_writes_config_and_from_run_reads_it(tmp_path):
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.train.loop import Trainer

    cfg = make_cfg(tmp_path)
    tr = Trainer(cfg)
    tr.fit()
    assert os.path.isfile(tmp_path / "config.json")
    with open(tmp_path / "config.json") as f:
        assert json.load(f)["model"]["arch"] == "resnet18_multistage"

    p = Predictor.from_run(str(tmp_path))  # no cfg: auto-loaded
    assert p.cfg.model.arch == "resnet18_multistage"
    assert p.cfg.model.decoder == "deconv2"
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes

    batch = SyntheticNuScenes(8, spec=cfg.data.sample_spec(), seed=5).batch(
        range(8))
    depth = p.predict(batch)
    assert depth.shape == (8, 64, 96)
    assert np.isfinite(depth).all()


def test_platform_flag_is_host_knob(tmp_path):
    """--platform parses, and a run's saved platform is NEVER adopted at
    --evaluate/--resume: where a run executed (TPU vs forced-CPU ablation)
    is a property of the host it ran on, not of the model/data."""
    import dataclasses

    assert parse_command(["--platform", "cpu"]).platform == "cpu"
    assert parse_command([]).platform == "default"

    run = tmp_path / "run"
    run.mkdir()
    cfg = dataclasses.replace(make_cfg(run), platform="cpu")
    save_config(cfg, str(run / "config.json"))
    assert parse_command(["--evaluate", str(run)]).platform == "default"
