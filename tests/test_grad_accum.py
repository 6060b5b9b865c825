"""Gradient accumulation (--grad-accum; SURVEY.md §2 parallelism table
"gradient accumulation: trivial under jit if needed").

Contract: one optimizer step over a (A, B, ...) stacked batch equals A
sequential micro-gradient evaluations (BN stats threaded micro-to-micro,
RNG folded per micro index) followed by ONE SGD update on the AVERAGED
gradient — verified leaf-for-leaf against a hand-composed oracle built from
the same make_micro_grad_fn surface. Plus an end-to-end sharded Trainer run
on the 8-device CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.models import create_model
from radar_depth_tpu.train.state import create_train_state, make_optimizer
from radar_depth_tpu.train.step import (
    init_model,
    make_micro_grad_fn,
    make_train_step,
)


def accum_config(tmpdir, accum=2, **kw):
    return TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=32,
                        num_val=8, max_depth=80.0),
        model=ModelConfig(arch="resnet18_latefusion", decoder="deconv2"),
        optim=OptimConfig(lr=0.01, grad_accum=accum),
        augment=AugmentConfig(),
        batch_size=8,
        epochs=1,
        output_dir=str(tmpdir),
        print_freq=100,
        **kw,
    )


def _setup(cfg):
    model, spec = create_model(
        cfg.model.arch, modality=cfg.model.modality, decoder=cfg.model.decoder,
        output_size=(cfg.data.height, cfg.data.width), dtype=jnp.float32)
    variables = init_model(model, spec, cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.optim, steps_per_epoch=4)
    state = create_train_state(variables, tx)
    ds = SyntheticNuScenes(cfg.optim.grad_accum * cfg.batch_size,
                           spec=cfg.data.sample_spec(), seed=3)
    micros = [ds.batch(range(i * cfg.batch_size, (i + 1) * cfg.batch_size))
              for i in range(cfg.optim.grad_accum)]
    stacked = {k: np.stack([m[k] for m in micros]) for k in micros[0]}
    return model, spec, tx, state, micros, stacked


def test_accum_step_matches_sequential_micro_grads(tmp_path):
    cfg = accum_config(tmp_path, accum=2)
    model, spec, tx, state, micros, stacked = _setup(cfg)
    key = jax.random.PRNGKey(7)

    # --- oracle: sequential micro grads + one averaged SGD update ---------
    micro = make_micro_grad_fn(model, spec, cfg, host_augmented=False)
    base = jax.random.fold_in(key, state.step)
    g0, stats, sums0 = micro(state.params, state.batch_stats, micros[0],
                             jax.random.fold_in(base, 0))
    g1, stats, sums1 = micro(state.params, stats, micros[1],
                             jax.random.fold_in(base, 1))
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    # --- the jitted accumulation step ------------------------------------
    step_fn = jax.jit(make_train_step(model, spec, cfg, tx,
                                      host_augmented=False))
    new_state, sums = step_fn(state, stacked, key)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-5),
        want_params, new_state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-5),
        stats, new_state.batch_stats)
    assert int(new_state.step) == 1  # ONE optimizer step for A micro-batches
    # metric sums accumulate across micro-batches; loss is averaged
    np.testing.assert_allclose(
        float(sums["count"]), float(sums0["count"]) + float(sums1["count"]))
    np.testing.assert_allclose(
        float(sums["loss"]), (float(sums0["loss"]) + float(sums1["loss"])) / 2,
        rtol=1e-5)


def test_accum_one_matches_plain_step(tmp_path):
    """grad_accum=1 goes through the plain (no-scan, no-stacking) path: the
    step is the micro-grad + one SGD update with the same key folding —
    guard that the factory refactor kept the original step semantics.
    (jit-vs-eager compilation differs, so this is tight-allclose, not
    bitwise; bitwise run-to-run determinism of the jitted step itself is
    covered by tests/test_train.py.)"""
    cfg1 = accum_config(tmp_path, accum=1)
    model, spec, tx, state, micros, _ = _setup(cfg1)
    key = jax.random.PRNGKey(11)
    step_fn = jax.jit(make_train_step(model, spec, cfg1, tx))
    s1, sums1 = step_fn(state, micros[0], key)

    micro = make_micro_grad_fn(model, spec, cfg1)
    g, stats, sums = micro(state.params, state.batch_stats, micros[0],
                           jax.random.fold_in(key, state.step))
    updates, _ = tx.update(g, state.opt_state, state.params)
    want = optax.apply_updates(state.params, updates)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=5e-6),
        want, s1.params)
    np.testing.assert_allclose(float(sums["loss"]), float(sums1["loss"]),
                               rtol=1e-5)


def test_trainer_grad_accum_end_to_end(tmp_path):
    """Sharded Trainer run with --grad-accum 2 on the 8-device mesh: step
    count = micro-batches / accum, CSVs written, loss finite."""
    from radar_depth_tpu.train.loop import Trainer

    cfg = accum_config(tmp_path, accum=2)
    tr = Trainer(cfg)
    tr.fit()
    # 32 train samples / (8 batch x 2 accum) = 2 optimizer steps
    assert int(jax.device_get(tr.state.step)) == 2
    assert os.path.exists(os.path.join(str(tmp_path), "train.csv"))
    assert os.path.exists(os.path.join(str(tmp_path), "test.csv"))
    with open(os.path.join(str(tmp_path), "train.csv")) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 2  # header + 1 epoch
    vals = dict(zip(rows[0].split(","), rows[1].split(",")))
    # reference CSV schema (no loss column): check the metric fields
    assert np.isfinite(float(vals["rmse"])) and float(vals["rmse"]) > 0
    assert np.isfinite(float(vals["mae"]))


def test_grad_accum_exceeding_split_raises(tmp_path):
    """batch x accum > train split would silently run zero optimizer steps
    per epoch — the Trainer rejects it with an explanation instead."""
    import pytest as _pytest

    from radar_depth_tpu.train.loop import Trainer

    cfg = accum_config(tmp_path, accum=8)  # 8 x 8 = 64 > 32 train samples
    with _pytest.raises(ValueError, match="zero optimizer steps"):
        Trainer(cfg)


def test_grad_accum_pulls_only_full_groups_from_native_loader(tmp_path):
    """40 samples / batch 8 = 5 micro-batches per epoch; at accum 2 the
    epoch must pull exactly 4 (2 full groups) — pulling the 5th and
    dropping it would silently skip samples and shift the loader's shuffle
    epochs (regression test for the tail-group consumption bug)."""
    from radar_depth_tpu.data import packed
    from radar_depth_tpu.data.schema import SampleSpec
    from radar_depth_tpu.train.loop import Trainer

    if not packed.native_available():
        pytest.skip("librdtp unavailable")
    spec = SampleSpec(height=64, width=96, num_sweeps=2)
    for split, n, seed in (("train", 40, 0), ("val", 8, 1)):
        ds = SyntheticNuScenes(n, spec=spec, seed=seed)
        packed.write_shard(str(tmp_path / "data" / split / "data.rdtp"),
                           [ds[i] for i in range(n)])
    cfg = TrainConfig(
        data=DataConfig(dataset="packed", data_root=str(tmp_path / "data"),
                        height=64, width=96, num_sweeps=2),
        model=ModelConfig(arch="resnet18", modality="rgbd",
                          decoder="deconv2"),
        optim=OptimConfig(grad_accum=2), augment=AugmentConfig(),
        batch_size=8, epochs=1, workers=2,
        output_dir=str(tmp_path / "run"), print_freq=100,
    )
    tr = Trainer(cfg)
    groups = list(tr._train_groups(0))
    assert len(groups) == 2
    assert groups[0]["image"].shape[0] == 2  # (accum, batch, ...) stacks
    # the loader delivered micro-batches 0..3 of its epoch 0 — NOT 4
    assert (tr._native_loader.epoch, tr._native_loader.index_in_epoch) \
        == (0, 3)
    tr.close()


def test_grad_accum_native_loader_thread_invariant(tmp_path):
    """--grad-accum composed with the C++ prefetch loader (worker-side
    augmentation): micro-batch grouping preserves claim-order determinism,
    so runs with different worker counts are bitwise equal."""
    from radar_depth_tpu.data import packed
    from radar_depth_tpu.data.schema import SampleSpec
    from radar_depth_tpu.train.loop import Trainer

    if not packed.native_available():
        pytest.skip("librdtp unavailable")
    spec = SampleSpec(height=64, width=96, num_sweeps=2)
    for split, n, seed in (("train", 32, 0), ("val", 8, 1)):
        ds = SyntheticNuScenes(n, spec=spec, seed=seed)
        packed.write_shard(str(tmp_path / "data" / split / "data.rdtp"),
                           [ds[i] for i in range(n)])
    rows = []
    for run, workers in (("a", 2), ("b", 5)):
        cfg = TrainConfig(
            data=DataConfig(dataset="packed",
                            data_root=str(tmp_path / "data"),
                            height=64, width=96, num_sweeps=2),
            model=ModelConfig(arch="resnet18", modality="rgbd",
                              decoder="deconv2"),
            optim=OptimConfig(grad_accum=2), augment=AugmentConfig(),
            batch_size=8, epochs=1, workers=workers,
            output_dir=str(tmp_path / run), print_freq=100,
        )
        tr = Trainer(cfg)
        tr.fit()
        assert int(jax.device_get(tr.state.step)) == 2  # 32/(8x2)
        with open(tmp_path / run / "train.csv") as f:
            rows.append(f.read().strip().splitlines()[-1])
    # identical metric values; timing columns (last two) naturally differ
    assert rows[0].split(",")[:9] == rows[1].split(",")[:9], rows
