"""--blend-tau brightness-conditional output policy (SURVEY.md §3.4
two-stage output semantics [M]): the multistage graph computes both heads;
the policy emits refined where the per-sample mean RGB < tau and coarse
where brighter — removing the measured day-RMSE refinement tax while
keeping the night wins (NOTES.md r5, results/r5/blend_*.txt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.inference import Predictor
from radar_depth_tpu.models import create_model
from radar_depth_tpu.models.fusion import blend_by_brightness
from radar_depth_tpu.train.step import init_model


def test_blend_by_brightness_selects_per_sample():
    coarse = jnp.ones((3, 4, 5, 1)) * 10.0
    refined = jnp.ones((3, 4, 5, 1)) * 20.0
    rgb = jnp.stack([
        jnp.full((4, 5, 3), 0.05),  # dark  -> refined
        jnp.full((4, 5, 3), 0.90),  # bright -> coarse
        jnp.full((4, 5, 3), 0.19),  # dark  -> refined
    ])
    out = blend_by_brightness(coarse, refined, rgb, tau=0.2)
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0, 0, 0], [20.0, 10.0, 20.0])


def _cfg(blend_tau: float) -> TrainConfig:
    return TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2),
        model=ModelConfig(arch="resnet18_multistage", decoder="deconv2",
                          blend_tau=blend_tau),
        optim=OptimConfig(),
        augment=AugmentConfig(),
        batch_size=2,
    )


def test_predictor_blend_tau_policy():
    cfg0 = _cfg(0.0)
    model, spec = create_model(
        cfg0.model.arch, decoder=cfg0.model.decoder,
        output_size=(cfg0.data.height, cfg0.data.width))
    variables = init_model(model, spec, cfg0, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]

    batch = SyntheticNuScenes(2, spec=cfg0.data.sample_spec(),
                              seed=3).batch(range(2))
    # sample 0 dark (image zeroed), sample 1 at natural brightness
    batch["image"] = np.array(batch["image"])
    batch["image"][0] = 0

    refined = Predictor(cfg0, params, stats).predict(batch)
    # tau -> 0+: every sample counts as bright -> pure coarse head
    coarse = Predictor(_cfg(1e-9), params, stats).predict(batch)
    assert np.abs(refined - coarse).max() > 0  # the heads differ
    # tau above every brightness: all dark -> identical to blend-off refined
    all_refined = Predictor(_cfg(2.0), params, stats).predict(batch)
    np.testing.assert_array_equal(all_refined, refined)
    # mid tau: the zeroed sample takes refined, the lit one takes coarse
    mixed = Predictor(_cfg(0.05), params, stats).predict(batch)
    np.testing.assert_array_equal(mixed[0], refined[0])
    np.testing.assert_array_equal(mixed[1], coarse[1])


def test_blend_tau_cli_and_run_config_adoption(tmp_path):
    from radar_depth_tpu.config import parse_command, save_config

    cfg = parse_command(["--arch", "resnet18_multistage",
                         "--blend-tau", "0.25"])
    assert cfg.model.blend_tau == 0.25
    # a run's config.json supplies blend_tau on bare --evaluate adoption
    run = tmp_path / "run"
    run.mkdir()
    save_config(cfg, str(run / "config.json"))
    adopted = parse_command(["--evaluate", str(run)])
    assert adopted.model.blend_tau == 0.25
