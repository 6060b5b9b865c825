"""Training harness tests: SGD-vs-torch oracle, 8-device sharded smoke train,
determinism, checkpoint round-trip (SURVEY.md §4 items 3/4)."""

import os

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


def tiny_config(tmpdir, arch="resnet18_latefusion", epochs=1, **kw):
    return TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8, max_depth=80.0),
        model=ModelConfig(arch=arch, decoder="deconv2", **kw),
        optim=OptimConfig(lr=0.01),
        augment=AugmentConfig(),
        batch_size=8,
        epochs=epochs,
        output_dir=str(tmpdir),
        print_freq=100,
    )


def test_sgd_matches_torch_oracle():
    """optax chain == torch.optim.SGD(momentum, weight_decay) over 5 steps."""
    import torch

    from radar_depth_tpu.train.state import make_optimizer

    cfg = OptimConfig(lr=0.1, momentum=0.9, weight_decay=0.01,
                      lr_decay_epochs=2, lr_decay_factor=0.1)
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
             for i in range(5)]

    # torch oracle with manual per-epoch lr adjustment (1 step = 1 "epoch" here)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=0.01)
    for i, g in enumerate(grads):
        for pg in opt.param_groups:
            pg["lr"] = 0.1 * 0.1 ** (i // 2)
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_smoke_sharded(tmp_path):
    """One epoch of the late-fusion model on the 8-device CPU mesh: loss
    finite, metrics populated, CSVs written, checkpoint saved+restorable."""
    from radar_depth_tpu.train.loop import Trainer

    assert jax.device_count() == 8, "conftest should fake 8 devices"
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg)
    tr.fit()
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))
    assert os.path.exists(os.path.join(cfg.output_dir, "test.csv"))
    assert os.path.exists(os.path.join(cfg.output_dir, "best.txt"))
    assert os.path.exists(os.path.join(cfg.output_dir, "comparison_epoch0.png"))
    with open(os.path.join(cfg.output_dir, "test.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("epoch,mse,rmse,absrel,lg10,mae,delta1")
    vals = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert np.isfinite(float(vals["rmse"])) and float(vals["rmse"]) > 0

    # resume restores epoch counter and state shape
    cfg2 = tiny_config(tmp_path, epochs=1)
    cfg2 = TrainConfig(**{**cfg2.__dict__, "resume": str(tmp_path)})
    tr2 = Trainer(cfg2)
    tr2.maybe_resume()
    assert tr2.start_epoch == 1
    np.testing.assert_allclose(
        float(tr2.state.step), float(tr.state.step))


@pytest.mark.slow
def test_train_step_deterministic(tmp_path):
    """Same seed ⇒ bitwise-identical first-step loss (jit purity + explicit
    keys; SURVEY.md §5 determinism)."""
    from radar_depth_tpu.train.loop import Trainer, iterate_batches
    from radar_depth_tpu.parallel import shard_batch

    losses = []
    for _ in range(2):
        cfg = tiny_config(tmp_path / f"d{_}", arch="resnet18")
        tr = Trainer(cfg)
        batch = next(iterate_batches(tr.train_ds, cfg.batch_size, True,
                                     cfg.seed, True))
        batch = shard_batch(batch, tr.mesh)
        key = jax.random.fold_in(tr.data_key, 0)
        _, sums = tr._train_step(tr.state, batch, key)
        losses.append(float(sums["loss"]))
    assert losses[0] == losses[1]


@pytest.mark.slow
def test_multistage_init_from_stage1(tmp_path):
    """SURVEY.md §3.5 two-phase workflow: --stage1-path grafts a late-fusion
    checkpoint into both stages of the multistage model."""
    import jax
    import numpy as np
    from radar_depth_tpu.train.loop import Trainer

    cfg1 = tiny_config(tmp_path / "s1", arch="resnet18_latefusion")
    tr1 = Trainer(cfg1)
    tr1.fit()

    cfg2 = tiny_config(tmp_path / "s2", arch="resnet18_multistage",
                       stage1_path=str(tmp_path / "s1"))
    tr2 = Trainer(cfg2)
    tr2.maybe_init_from_stage1()
    want = jax.tree_util.tree_map(np.asarray, tr1.state.params)
    for stage in ("stage1", "stage2"):
        got = jax.tree_util.tree_map(np.asarray, tr2.state.params[stage])
        leaves_w = jax.tree_util.tree_leaves(want)
        leaves_g = jax.tree_util.tree_leaves(got)
        assert len(leaves_w) == len(leaves_g)
        for a, b in zip(leaves_g, leaves_w):
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_validate_splits_day_night(tmp_path):
    """Per-split (day/night) evaluation over the sharded val pass
    (SURVEY.md §6: the paper reports day/night separately)."""
    from radar_depth_tpu.train.loop import Trainer

    base = tiny_config(tmp_path)
    # sample convention: this test asserts batch-size-INVARIANT metrics
    # below, a property only the per-sample averaging has (the default
    # 'batch' mode pools per loop batch like the reference AverageMeter).
    cfg = TrainConfig(**{**base.__dict__,
                         "metric_avg": "sample",
                         "data": DataConfig(**{**base.data.__dict__,
                                               "num_val": 24})})
    tr = Trainer(cfg)
    tags = {tr.val_ds.sample_tag(i) for i in range(len(tr.val_ds))}
    splits = tr.validate_splits(0)
    assert set(splits) == tags == {"day", "night"}
    overall = tr.validate(0, viz=False)
    total = sum(m["count"] for m in splits.values())
    assert total == overall["count"] == 24  # padding never double-counts
    for m in splits.values():
        assert np.isfinite(m["rmse"]) and m["rmse"] > 0

    # --eval-batch-size: a bigger val batch (amortizes dispatch) must not
    # change the metrics — per-sample averaging is batch-size invariant.
    import dataclasses

    tr.cfg = dataclasses.replace(cfg, eval_batch_size=16)
    m2 = tr.validate(0, viz=False)
    assert m2["count"] == overall["count"]
    np.testing.assert_allclose(m2["rmse"], overall["rmse"], rtol=1e-5)

    # per-split CSV artifacts (written by --evaluate --eval-splits)
    tr.write_split_csvs(splits)
    for tag, m in splits.items():
        p = os.path.join(cfg.output_dir, f"test_{tag}.csv")
        with open(p) as f:
            lines = f.read().strip().splitlines()
        assert lines[0].startswith("epoch,mse,rmse")
        assert float(lines[1].split(",")[2]) == round(m["rmse"], 6) or \
            abs(float(lines[1].split(",")[2]) - m["rmse"]) < 1e-5
    tr.close()


@pytest.mark.slow
def test_train_convergence_sharded(tmp_path):
    """Multi-epoch convergence on the 8-device mesh (SURVEY.md §4 items 4-5;
    VERDICT r1 #8): the sharded training step must actually LEARN — train loss
    decreases across epochs — and the checkpoint manager must mark the
    best-val-RMSE epoch as best (reference model_best semantics)."""
    import csv

    from radar_depth_tpu.train import checkpoint as ckpt_lib
    from radar_depth_tpu.train.loop import Trainer

    assert jax.device_count() == 8
    cfg = tiny_config(tmp_path, epochs=3)
    tr = Trainer(cfg)
    tr.maybe_resume()
    losses, val_rmses = [], []
    for epoch in range(cfg.epochs):
        train_m = tr.train_epoch(epoch)
        val_m = tr.validate(epoch, viz=False)
        tr.ckpt.save(epoch, jax.tree_util.tree_map(np.asarray, tr.state), val_m)
        losses.append(train_m["loss"])
        val_rmses.append(val_m["rmse"])
    best_step = tr.ckpt.best_step()
    tr.close()

    # Learning: strictly decreasing epoch losses on the deterministic
    # synthetic set (seeded; same assertion holds run-to-run by jit purity).
    assert losses[1] < losses[0] and losses[2] < losses[1], losses
    assert losses[2] < 0.8 * losses[0], f"barely learned: {losses}"
    # Best-checkpoint selection matches argmin of the recorded val RMSEs.
    assert best_step == int(np.argmin(val_rmses)), (best_step, val_rmses)


@pytest.mark.slow
def test_resume_bitwise_equals_uninterrupted(tmp_path):
    """Checkpoint/resume exactness (SURVEY.md §5 C10): training 2 epochs
    straight must equal 1 epoch + checkpoint + restart-with---resume + 1
    epoch, bitwise in the final val metrics — catches optimizer-state, key-
    threading, or shuffle-order drift across the resume boundary."""
    from radar_depth_tpu.train.loop import Trainer

    cfg_a = tiny_config(tmp_path / "straight", epochs=2)
    tr_a = Trainer(cfg_a)
    tr_a.fit()

    cfg_b1 = tiny_config(tmp_path / "interrupted", epochs=1)
    Trainer(cfg_b1).fit()
    cfg_b2 = tiny_config(tmp_path / "interrupted", epochs=2)
    cfg_b2 = TrainConfig(**{**cfg_b2.__dict__,
                            "resume": str(tmp_path / "interrupted")})
    tr_b = Trainer(cfg_b2)
    tr_b.fit()

    import csv

    def last_row(run):
        with open(os.path.join(str(run), "test.csv")) as f:
            return list(csv.DictReader(f))[-1]

    row_a, row_b = last_row(tmp_path / "straight"), last_row(
        tmp_path / "interrupted")
    assert row_a["epoch"] == row_b["epoch"] == "1"
    for k in ("mse", "rmse", "mae", "absrel", "delta1"):
        assert row_a[k] == row_b[k], (k, row_a[k], row_b[k])


def test_restore_for_evaluate_specific_step(tmp_path):
    """--evaluate accepts a run dir (best checkpoint), the checkpoints dir,
    or a specific numeric step dir (upstream loads an explicit .pth.tar)."""
    from radar_depth_tpu.train import checkpoint as ckpt_lib

    mgr = ckpt_lib.CheckpointManager(str(tmp_path))
    for epoch, rmse in enumerate([5.0, 2.0, 3.0]):
        mgr.save(epoch, {"w": np.full(3, float(epoch), np.float32)},
                 {"rmse": rmse})
    mgr.close()
    template = {"w": np.zeros(3, np.float32)}
    # run dir → best (epoch 1, rmse 2.0)
    st = ckpt_lib.restore_for_evaluate(str(tmp_path), template)
    np.testing.assert_array_equal(st["w"], np.full(3, 1.0, np.float32))
    # explicit step dir → that exact epoch
    st2 = ckpt_lib.restore_for_evaluate(
        os.path.join(str(tmp_path), "checkpoints", "2"), template)
    np.testing.assert_array_equal(st2["w"], np.full(3, 2.0, np.float32))


def test_checkpoint_keeps_latest_and_best(tmp_path):
    """Latest epoch must survive preservation even when it is not among the
    best-N by RMSE, or --resume silently rewinds and re-trains epochs
    (reference: resume-from-last + model_best copy; ADVICE r1 medium #2)."""
    from radar_depth_tpu.train import checkpoint as ckpt_lib

    mgr = ckpt_lib.CheckpointManager(str(tmp_path), max_to_keep=2)
    rmses = [5.0, 1.0, 2.0, 3.0, 4.0]  # best-2 = epochs 1,2; latest = 4
    for epoch, rmse in enumerate(rmses):
        state = {"w": np.full(4, float(epoch), np.float32)}
        mgr.save(epoch, state, {"rmse": rmse})
    assert mgr.best_step() == 1
    template = {"w": np.zeros(4, np.float32)}
    state, epoch, best = mgr.restore(template)
    assert epoch == 4, "latest checkpoint was deleted by the best-N policy"
    np.testing.assert_array_equal(state["w"], np.full(4, 4.0, np.float32))
    assert best <= 4.0
    mgr.close()


def test_run_lock(tmp_path):
    """Two trainers must never share an output dir (observed r4: interleaved
    CSVs + colliding orbax step dirs). Ownership is a kernel flock: a live
    foreign holder refuses, death releases instantly (no stale-steal races),
    and the same process re-acquires (sequential Trainers in one test)."""
    import subprocess
    import sys

    from radar_depth_tpu.utils.runlock import (
        acquire_run_lock,
        release_run_lock,
    )

    probe = (
        "from radar_depth_tpu.utils.runlock import acquire_run_lock;"
        f"acquire_run_lock({str(tmp_path)!r})"
    )

    # a dead holder's lock file does not block (flock died with the pid)
    lock = tmp_path / ".trainer.lock"
    lock.write_text("4194303\n")
    path = acquire_run_lock(str(tmp_path))
    assert lock.read_text().strip() == str(os.getpid())
    # same process re-acquires (refcounted), and a FOREIGN process is refused
    assert acquire_run_lock(str(tmp_path)) == path
    rc = subprocess.run([sys.executable, "-c", probe],
                        capture_output=True, text=True)
    assert rc.returncode != 0 and "live trainer" in rc.stderr
    # releasing ONE of two in-process acquisitions keeps the flock held
    # (overlapping Trainer lifetimes — ADVICE r4: the first close must not
    # drop protection for the survivor)
    release_run_lock(path)
    rc = subprocess.run([sys.executable, "-c", probe],
                        capture_output=True, text=True)
    assert rc.returncode != 0 and "live trainer" in rc.stderr
    # release → a foreign process can acquire (and auto-releases on exit)
    release_run_lock(path)
    rc = subprocess.run([sys.executable, "-c", probe],
                        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr[-300:]
    # releasing an unheld path is a no-op
    release_run_lock(path)


def test_stale_interrupted_save_dir_swept(tmp_path):
    """A SIGKILL mid-save leaves `<step>.orbax-checkpoint-tmp`; a fresh run
    in that dir must sweep it, not die with FileExistsError when it saves
    the same step (observed: a killed epoch-0 save blocked the rerun)."""
    from radar_depth_tpu.train import checkpoint as ckpt_lib

    stale = tmp_path / "checkpoints" / "0.orbax-checkpoint-tmp"
    stale.mkdir(parents=True)
    (stale / "partial_leaf").write_bytes(b"garbage from a killed save")
    # orbax's non-atomic-rename form (e.g. GCS) carries a timestamp suffix —
    # the sweep must catch it too (ADVICE r4 low)
    stale_ts = tmp_path / "checkpoints" / "3.orbax-checkpoint-tmp-1755600000"
    stale_ts.mkdir(parents=True)
    # non-matching names must survive (the pattern is anchored: numeric
    # timestamp only)
    keep = tmp_path / "checkpoints" / "4.orbax-checkpoint-tmp-notatimestamp"
    keep.mkdir(parents=True)
    mgr = ckpt_lib.CheckpointManager(str(tmp_path))
    assert not stale.exists(), "stale tmp dir must be swept at init"
    assert not stale_ts.exists(), "timestamped tmp dir must be swept too"
    assert keep.exists(), "non-matching names must survive the sweep"
    keep.rmdir()
    mgr.save(0, {"w": np.full(3, 7.0, np.float32)}, {"rmse": 1.0}, wait=True)
    template = {"w": np.zeros(3, np.float32)}
    state, epoch, best = mgr.restore(template)
    np.testing.assert_array_equal(state["w"], np.full(3, 7.0, np.float32))
    assert epoch == 0
    mgr.close()


def test_ckpt_every_cadence():
    """--ckpt-every k: improvements and the final epoch always save; the
    periodic cadence is anchored on the final epoch so a completed run's
    last checkpoint is never an off-cadence orphan. k=1 saves every epoch
    (reference behavior). The per-epoch state fetch dominated epoch wall
    time on the bench relay (23-28s vs 9s train — NOTES.md r4)."""
    from radar_depth_tpu.train.loop import should_checkpoint

    # k=1: always
    assert all(should_checkpoint(e, False, 1, 10) for e in range(10))
    # k=4, 10 epochs, no improvements: anchored on epoch 9 -> {1, 5, 9}
    saved = [e for e in range(10) if should_checkpoint(e, False, 4, 10)]
    assert saved == [1, 5, 9]
    # improvements force a save regardless of cadence
    assert should_checkpoint(2, True, 4, 10)
    # final epoch always saves even with k > total
    assert should_checkpoint(9, False, 100, 10)
    assert not should_checkpoint(8, False, 100, 10)


def test_warm_start_init_from(tmp_path):
    """--init-from grafts a same-arch run's best params with a FRESH
    optimizer/epoch (vs --resume); mismatched arch trees are rejected."""
    import dataclasses

    from radar_depth_tpu.train.loop import Trainer

    cfg1 = tiny_config(tmp_path / "run1")
    Trainer(cfg1).fit()

    cfg2 = dataclasses.replace(tiny_config(tmp_path / "run2"),
                               init_from=str(tmp_path / "run1"))
    tr = Trainer(cfg2)
    before = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
    tr.maybe_warm_start()
    after = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))
    assert tr.start_epoch == 0  # fresh schedule
    assert int(tr.state.step) == 0  # fresh optimizer

    # arch-mismatched warm start must be rejected
    cfg3 = dataclasses.replace(
        tiny_config(tmp_path / "run3", arch="resnet18_multistage"),
        init_from=str(tmp_path / "run1"))
    tr3 = Trainer(cfg3)
    with pytest.raises(ValueError):
        tr3.maybe_warm_start()


@pytest.mark.slow
def test_resume_after_sigkill_mid_training(tmp_path):
    """Crash recovery (SURVEY.md §5 failure-recovery; seen live when the
    device relay died mid-run): SIGKILL a training process while async orbax
    saves are in flight, then --resume the run dir in a fresh process. Atomic
    checkpointing must leave only complete steps behind (in-flight tmp dirs
    ignored) and the resumed run must finish every epoch."""
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run = tmp_path / "run"
    flags = ["--arch", "resnet18_latefusion", "--decoder", "deconv2",
             "-b", "8", "--epochs", "6", "--height", "64", "--width", "96",
             "--num-sweeps", "2", "--num-train", "16", "--num-val", "8",
             "--output-dir", str(run)]

    def code(extra):
        return (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            "from radar_depth_tpu.train.main import main\n"
            f"raise SystemExit(main({flags + extra!r}))\n"
        )

    proc = subprocess.Popen([sys.executable, "-c", code([])], cwd=repo,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        ckpt_dir = run / "checkpoints"
        deadline = time.time() + 600
        while time.time() < deadline:
            done = [d for d in os.listdir(ckpt_dir)] if ckpt_dir.is_dir() else []
            if any(d.isdigit() for d in done):
                break
            if proc.poll() is not None:
                pytest.fail("training exited before first checkpoint")
            time.sleep(0.5)
        else:
            pytest.fail("no checkpoint appeared within 600s")
        time.sleep(1.5)  # land mid-epoch / mid-async-save
        assert proc.poll() is None, "run finished before the kill — slow down"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    resumed = subprocess.run(
        [sys.executable, "-c", code(["--resume", str(run)])], cwd=repo,
        capture_output=True, text=True, timeout=900)
    assert resumed.returncode == 0, resumed.stderr[-4000:]

    steps = sorted(int(d) for d in os.listdir(run / "checkpoints")
                   if d.isdigit())
    assert steps and steps[-1] == 5  # epochs are 0-indexed; 6th = step 5
    import csv

    with open(run / "test.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows[-1]["epoch"] == "5"
