"""--stage2-coarse: SURVEY.md §3.4 tags stage-2's input as
"{rgb, filtered radar (+D₁?)}" [M] — this variant feeds the coarse
prediction as a second radar-branch channel. Tests: zero-padded widening
graft is function-preserving, gradients flow, CLI wiring, and the
--stage1-path graft trains end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from radar_depth_tpu.models import create_model
from radar_depth_tpu.train.loop import _widen_to_template


def _inputs(h=64, w=96, b=2):
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
    radar = jnp.asarray(
        np.where(rng.random((b, h, w, 1)) < 0.02,
                 rng.random((b, h, w, 1)) * 50, 0.0), jnp.float32)
    return rgb, radar


def test_widened_graft_is_function_preserving():
    """coarse-variant params built by zero-padding a plain multistage's
    params produce identical (coarse, refined) outputs: the D1 channel
    enters through zero weights."""
    rgb, radar = _inputs()
    kwargs = dict(decoder="deconv2", output_size=(64, 96))
    plain, _ = create_model("resnet18_multistage", **kwargs)
    coarse_m, _ = create_model("resnet18_multistage", stage2_coarse=True,
                               **kwargs)
    v_plain = plain.init(jax.random.PRNGKey(0), rgb, radar, train=False)
    v_c = coarse_m.init(jax.random.PRNGKey(1), rgb, radar, train=False)
    params = dict(v_plain["params"])
    params["stage2"] = _widen_to_template(v_c["params"]["stage2"],
                                          v_plain["params"]["stage2"])
    out_p = plain.apply({"params": v_plain["params"],
                         "batch_stats": v_plain["batch_stats"]},
                        rgb, radar, train=False)
    out_c = coarse_m.apply({"params": params,
                            "batch_stats": v_plain["batch_stats"]},
                           rgb, radar, train=False)
    for a, b in zip(out_p, out_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_coarse_channel_carries_signal_and_gradients():
    """With non-zero D1-channel weights the refined output depends on the
    coarse map, and gradients reach stage-2's widened conv1."""
    rgb, radar = _inputs()
    model, spec = create_model("resnet18_multistage", stage2_coarse=True,
                               decoder="deconv2", output_size=(64, 96))
    v = model.init(jax.random.PRNGKey(0), rgb, radar, train=False)
    k = v["params"]["stage2"]["radar_encoder"]["conv1"]["kernel"]
    assert k.shape[2] == 2  # widened input channels

    def loss(p):
        coarse, refined = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, rgb, radar,
            train=False)
        return jnp.mean(refined**2)

    g = jax.grad(loss)(v["params"])
    gk = np.asarray(g["stage2"]["radar_encoder"]["conv1"]["kernel"])
    assert np.isfinite(gk).all()
    assert np.abs(gk[..., 1, :]).max() > 0  # D1 channel receives gradient
    # stage-1 receives NO gradient through stage-2 (stop_gradient on both
    # the filter input and the D1 channel): its grads come only from the
    # coarse loss — here loss uses refined alone, so stage1 grads are 0.
    g1 = np.concatenate([np.asarray(x).ravel() for x in
                         jax.tree_util.tree_leaves(g["stage1"])])
    assert np.abs(g1).max() == 0.0


def test_cli_and_config_roundtrip(tmp_path):
    from radar_depth_tpu.config import parse_command, save_config

    cfg = parse_command(["--arch", "resnet18_multistage", "--stage2-coarse"])
    assert cfg.model.stage2_coarse is True
    run = tmp_path / "run"
    run.mkdir()
    save_config(cfg, str(run / "config.json"))
    cfg2 = parse_command(["--evaluate", str(run)])
    assert cfg2.model.stage2_coarse is True  # adopted from the run config


@pytest.mark.slow
def test_stage1_graft_trains_end_to_end(tmp_path):
    """latefusion run → multistage --stage2-coarse --stage1-path graft
    (zero-padded widening) → one epoch trains on the 8-device mesh."""
    from radar_depth_tpu.train.loop import Trainer

    data = DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                      num_val=8)
    lf_cfg = TrainConfig(
        data=data, model=ModelConfig(arch="resnet18_latefusion",
                                     decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(tmp_path / "lf"), print_freq=100)
    Trainer(lf_cfg).fit()

    ms_cfg = TrainConfig(
        data=data,
        model=ModelConfig(arch="resnet18_multistage", decoder="deconv2",
                          stage2_coarse=True,
                          stage1_path=str(tmp_path / "lf")),
        optim=OptimConfig(lr=0.002), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(tmp_path / "ms"), print_freq=100)
    tr = Trainer(ms_cfg)
    tr.fit()
    assert int(jax.device_get(tr.state.step)) == 2  # 16/8 batches
    import os

    assert os.path.exists(tmp_path / "ms" / "test.csv")


def test_composes_with_uncertainty_variant():
    """stage2_coarse composes with the uncertainty-weighted registry arch:
    three outputs (coarse, refined, stage_log_var) and a 2-ch stage-2
    radar conv1."""
    rgb, radar = _inputs()
    model, spec = create_model("resnet18_multistage_uncertainty",
                               stage2_coarse=True, decoder="deconv2",
                               output_size=(64, 96))
    assert spec.multistage
    v = model.init(jax.random.PRNGKey(0), rgb, radar, train=False)
    k = v["params"]["stage2"]["radar_encoder"]["conv1"]["kernel"]
    assert k.shape[2] == 2
    out = model.apply({"params": v["params"],
                       "batch_stats": v["batch_stats"]}, rgb, radar,
                      train=False)
    assert len(out) == 3 and out[2].shape == (2,)
    assert np.isfinite(np.asarray(out[1])).all()


@pytest.mark.slow
def test_eval_two_stage_adopts_run_config(tmp_path, capsys):
    """scripts/eval_two_stage.py with NO model flags must rebuild the run's
    exact graph from config.json (the stage-2 filter is parameter-free, so a
    wrong --filter-mode would silently mis-evaluate)."""
    import importlib.util
    import os
    import sys

    from radar_depth_tpu.data import packed
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.train.loop import Trainer

    data = DataConfig(dataset="packed", data_root=str(tmp_path / "data"),
                      height=64, width=96, num_sweeps=2)
    spec = data.sample_spec()
    for split, n, seed in (("train", 16, 1), ("val", 8, 2)):
        d = tmp_path / "data" / split
        d.mkdir(parents=True)
        ds = SyntheticNuScenes(n, spec=spec, seed=seed)
        # day/night tags on val: exercised below by --split night
        tags = ["night" if i % 2 else "day" for i in range(n)] \
            if split == "val" else None
        packed.write_shard(str(d / "data.rdtp"),
                           [ds[i] for i in range(n)], tags=tags)

    cfg = TrainConfig(
        data=data,
        model=ModelConfig(arch="resnet18_multistage", decoder="deconv2",
                          filter_mode="rel", stage2_coarse=True),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(tmp_path / "run"), print_freq=100)
    Trainer(cfg).fit()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec_mod = importlib.util.spec_from_file_location(
        "eval_two_stage", os.path.join(repo, "scripts", "eval_two_stage.py"))
    mod = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = ["eval_two_stage.py", "--run", str(tmp_path / "run"),
                "--data-root", str(tmp_path / "data"), "--batch", "8"]
    try:
        assert mod.main() == 0
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "filter=rel" in out  # adopted from config.json, not the default
    assert "refined" in out and "coarse" in out

    # Multi-split in ONE process: comma-separated --split evaluates each
    # tag reusing the already-jitted graphs; --out-prefix mirrors each
    # split's report to a file (how the r4 queue records tracked evidence).
    prefix = str(tmp_path / "ev_")
    sys.argv = ["eval_two_stage.py", "--run", str(tmp_path / "run"),
                "--data-root", str(tmp_path / "data"), "--batch", "8",
                "--split", "all,night,day", "--out-prefix", prefix]
    try:
        assert mod.main() == 0
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "val n=8 split=all" in out    # 'all' = whole set
    assert "val n=4 split=night" in out  # tags sidecar filtering
    assert "val n=4 split=day" in out
    for tag in ("all", "night", "day"):
        with open(f"{prefix}{tag}.txt") as f:
            assert f"split={tag}" in f.read()
    # an unknown tag fails loudly (nonzero exit), not silently
    sys.argv = ["eval_two_stage.py", "--run", str(tmp_path / "run"),
                "--data-root", str(tmp_path / "data"), "--batch", "8",
                "--split", "dusk"]
    try:
        assert mod.main() == 1
    finally:
        sys.argv = old_argv
    capsys.readouterr()
