"""DP sharding must not change numerics: eval metrics on an 8-device mesh
equal the single-device result (SURVEY.md §4 item 4)."""

import pytest
import numpy as np
import jax

from radar_depth_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.models import create_model
from radar_depth_tpu.parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch
from radar_depth_tpu.train.step import init_model, make_eval_step

pytestmark = pytest.mark.slow


def test_eval_metrics_match_across_mesh_sizes():
    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(),
        batch_size=8,
    )
    spec = cfg.data.sample_spec()
    model, arch_spec = create_model(cfg.model.arch, modality="rgbd",
                                    decoder="deconv2",
                                    output_size=(spec.height, spec.width))
    variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
    ds = SyntheticNuScenes(8, spec=spec, seed=9)
    host_batch = ds.batch(range(8))
    eval_fn = make_eval_step(model, arch_spec, cfg)

    results = []
    for ndev in (1, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        repl = replicated_sharding(mesh)
        fn = jax.jit(eval_fn, in_shardings=(repl, repl, batch_sharding(mesh)),
                     out_shardings=repl)
        batch = shard_batch(host_batch, mesh)
        params = jax.device_put(variables["params"], repl)
        stats = jax.device_put(variables["batch_stats"], repl)
        sums = jax.tree_util.tree_map(np.asarray, fn(params, stats, batch))
        results.append(sums)
    for k in results[0]:
        # the default batch convention carries large unnormalized f32 sums
        # (mse·px ~ 1e9); GSPMD reduction order across mesh sizes moves the
        # last ~4e-5 — tolerance covers reduction-order noise only.
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-4,
                                   err_msg=k)


def test_batch_convention_metrics_match_across_mesh_sizes():
    """convention='batch' pools pixels across the WHOLE (global) batch — the
    pooled sums must psum across shards so an 8-device mesh reports the same
    AverageMeter-weighted metrics as a single device."""
    from radar_depth_tpu.metrics import compute_metric_sums

    rng = np.random.default_rng(4)
    pred = rng.uniform(1, 60, size=(8, 16, 24, 1)).astype(np.float32)
    target = rng.uniform(1, 60, size=(8, 16, 24, 1)).astype(np.float32)
    target[rng.uniform(size=target.shape) < 0.6] = 0.0

    results = []
    for ndev in (1, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        fn = jax.jit(
            lambda p, t: compute_metric_sums(p, t, convention="batch"),
            in_shardings=(batch_sharding(mesh),) * 2,
            out_shardings=replicated_sharding(mesh))
        b = shard_batch({"p": pred, "t": target}, mesh)
        results.append(jax.tree_util.tree_map(
            np.asarray, fn(b["p"], b["t"])))
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=2e-5,
                                   err_msg=k)


def test_two_axis_mesh_matches_one_axis():
    """A 2-axis (replica=2, data=4) mesh — the future (dcn, ici) topology —
    must reproduce 1-axis numerics: batch shards over both axes, metric sums
    psum over both (SURVEY.md §2 parallelism table, 'keep the mesh
    abstraction so a 2-axis mesh can be added later')."""
    from radar_depth_tpu.metrics import compute_metric_sums
    from radar_depth_tpu.parallel import make_mesh_2d

    rng = np.random.default_rng(6)
    pred = rng.uniform(1, 60, size=(8, 16, 24, 1)).astype(np.float32)
    target = rng.uniform(1, 60, size=(8, 16, 24, 1)).astype(np.float32)
    target[rng.uniform(size=target.shape) < 0.6] = 0.0

    results = []
    for mesh in (make_mesh(jax.devices()[:8]), make_mesh_2d(2, 4)):
        fn = jax.jit(compute_metric_sums,
                     in_shardings=(batch_sharding(mesh),) * 2,
                     out_shardings=replicated_sharding(mesh))
        b = shard_batch({"p": pred, "t": target}, mesh)
        results.append(jax.tree_util.tree_map(np.asarray, fn(b["p"], b["t"])))
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=2e-5,
                                   err_msg=k)
