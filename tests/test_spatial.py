"""Spatial partitioning (--spatial): image height sharded over a 'space'
mesh axis, conv halo exchanges inserted by GSPMD (SURVEY.md §5 named this
"the analogue" for resolutions exceeding per-chip memory — here it is built
and numerically pinned, not just documented). parallel/mesh.py::
make_spatial_mesh / spatial_constraint; train/step.py mesh plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from radar_depth_tpu.models import create_model
from radar_depth_tpu.parallel.mesh import (
    batch_sharding,
    make_spatial_mesh,
    replicated_sharding,
    spatial_constraint,
)


def _inputs(b=4, h=64, w=96):
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
    radar = jnp.asarray(
        np.where(rng.random((b, h, w, 1)) < 0.02,
                 rng.random((b, h, w, 1)) * 50, 0.0), jnp.float32)
    return rgb, radar


def test_spatial_forward_matches_single_device():
    """Two-stage forward on a (data=2, space=4) mesh with H sharded over
    'space' equals the unsharded graph — GSPMD's halo exchanges preserve
    conv/pool/resize numerics through both stages and the radar filter."""
    rgb, radar = _inputs()
    model, _ = create_model("resnet18_multistage", decoder="deconv2",
                            output_size=(64, 96))
    v = model.init(jax.random.PRNGKey(0), rgb, radar, train=False)
    ref_c, ref_r = model.apply(v, rgb, radar, train=False)

    mesh = make_spatial_mesh(4)
    assert mesh.axis_names == ("data", "space")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh_in = NamedSharding(mesh, P("data", "space"))
    vs = jax.device_put(v, replicated_sharding(mesh))

    @jax.jit
    def fwd(variables, rgb, radar):
        return model.apply(variables, rgb, radar, train=False)

    c, r = fwd(vs, jax.device_put(rgb, sh_in), jax.device_put(radar, sh_in))
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-5)


def test_batch_sharding_skips_space_axis():
    """The raw batch shards over 'data' only; spatial_constraint is a no-op
    without a 'space' axis and constrains exactly the NHWC leaves with one."""
    from jax.sharding import PartitionSpec as P

    mesh = make_spatial_mesh(4)
    assert batch_sharding(mesh).spec == P(("data",))
    assert batch_sharding(mesh, accum=True).spec == P(None, ("data",))

    from radar_depth_tpu.parallel.mesh import make_mesh

    plain = {"x": jnp.zeros((2, 8, 8, 1)), "pts": jnp.zeros((2, 16, 4))}
    assert spatial_constraint(plain, make_mesh()) is plain  # no 'space' axis

    with mesh:
        out = jax.jit(lambda b: spatial_constraint(b, mesh))(plain)
    assert out["x"].shape == plain["x"].shape
    assert out["pts"].shape == plain["pts"].shape


@pytest.mark.slow
def test_spatial_micro_grads_match_data_parallel():
    """The FULL train micro-step (on-device preproc → forward → masked loss
    → backward) under spatial sharding produces the same loss and gradients
    as the plain data-parallel step."""
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.train.step import init_model, make_micro_grad_fn
    from radar_depth_tpu.models import create_model as cm

    cfg = TrainConfig(
        data=DataConfig(height=128, width=96, num_sweeps=2, num_train=8,
                        num_val=4),
        model=ModelConfig(arch="resnet18_latefusion", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(enabled=False),
        batch_size=4, epochs=1, output_dir="/tmp/unused", spatial=4)
    model, spec = cm(cfg.model.arch, decoder="deconv2", output_size=(128, 96))
    variables = init_model(model, spec, cfg, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    batch = {k: jnp.asarray(v) for k, v in SyntheticNuScenes(
        4, spec=cfg.data.sample_spec(), seed=3).batch(range(4)).items()}
    key = jax.random.PRNGKey(1)

    ref_fn = jax.jit(make_micro_grad_fn(model, spec, cfg))
    g_ref, _, sums_ref = ref_fn(params, stats, batch, key)

    mesh = make_spatial_mesh(4)
    repl = replicated_sharding(mesh)
    sp_fn = jax.jit(make_micro_grad_fn(model, spec, cfg, mesh=mesh),
                    in_shardings=(repl, repl, batch_sharding(mesh), repl),
                    out_shardings=(repl, repl, repl))
    from radar_depth_tpu.parallel.mesh import shard_batch

    g_sp, _, sums_sp = sp_fn(
        jax.device_put(params, repl), jax.device_put(stats, repl),
        shard_batch(batch, mesh, process_local=False),
        jax.device_put(key, repl))

    np.testing.assert_allclose(float(sums_sp["loss"]),
                               float(sums_ref["loss"]), rtol=1e-5)
    # Cross-device reduction order adds f32 noise (measured ~1e-5 abs);
    # the failure mode this defends against is the ~4x gradient inflation
    # of degenerate shardings, so per-leaf NORM ratios are the sharp check.
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    for a, b in zip(flat_ref, flat_sp):
        ratio = float(np.linalg.norm(b) / max(np.linalg.norm(a), 1e-12))
        assert 0.98 < ratio < 1.02, ratio
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.1, atol=5e-4)


@pytest.mark.slow
def test_trainer_spatial_epoch(tmp_path):
    """--spatial 4 end-to-end: Trainer builds the (data=2, space=4) mesh,
    trains an epoch, and validates with finite metrics."""
    from radar_depth_tpu.train.loop import Trainer

    cfg = TrainConfig(
        data=DataConfig(height=128, width=96, num_sweeps=2, num_train=8,
                        num_val=4),
        model=ModelConfig(arch="resnet18_latefusion", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=4,
        epochs=1, output_dir=str(tmp_path), print_freq=100, spatial=4)
    tr = Trainer(cfg)
    assert tr.mesh.axis_names == ("data", "space")
    tr.fit()
    import csv

    with open(tmp_path / "test.csv") as f:
        row = list(csv.DictReader(f))[-1]
    assert np.isfinite(float(row["rmse"]))

    # degenerate bottleneck heights (H/32 < 3) mis-partition the backward
    # (measured ~4x gradient inflation at H=64) — rejected loudly
    import dataclasses

    bad = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, height=64),
        output_dir=str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="spatial requires height"):
        Trainer(bad)


def test_predictor_spatial_matches_plain():
    """Serving path: Predictor(cfg.spatial=4) builds the (data, space) mesh
    and returns the same depth maps as the unsharded predictor (inference is
    forward-only, exact under spatial partitioning at any height)."""
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.train.step import init_model

    import dataclasses

    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=8,
                        num_val=4),
        model=ModelConfig(arch="resnet18_latefusion", decoder="deconv2",
                          dtype="float32"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=4,
        epochs=1, output_dir="/tmp/unused")
    model, spec = create_model(cfg.model.arch, decoder="deconv2",
                               output_size=(64, 96))
    v = init_model(model, spec, cfg, jax.random.PRNGKey(0))

    plain = Predictor(cfg, v["params"], v["batch_stats"])
    sp = Predictor(dataclasses.replace(cfg, spatial=4), v["params"],
                   v["batch_stats"])
    assert sp._mesh is not None and sp._mesh.axis_names == ("data", "space")

    batch = SyntheticNuScenes(4, spec=cfg.data.sample_spec(), seed=9).batch(
        range(4))
    np.testing.assert_allclose(sp.predict(batch), plain.predict(batch),
                               rtol=1e-5, atol=1e-5)

    # B=1 request: the tile pads up to the data-axis size (sharded leading
    # dims must divide evenly) and the padding is sliced off the output
    one = SyntheticNuScenes(1, spec=cfg.data.sample_spec(), seed=9).batch(
        range(1))
    got = sp.predict(one)
    assert got.shape[0] == 1
    np.testing.assert_allclose(got, plain.predict(one), rtol=1e-5, atol=1e-5)
