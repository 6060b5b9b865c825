"""Epoch-level training/eval loops (upstream:main.py::main/train/validate;
SURVEY.md §3.1/§3.2), pjit-sharded over the data mesh.

Timing fields mirror the reference's Result.data_time/gpu_time: data_time is
host batch assembly + transfer, gpu_time the on-device step (block_until_ready
replaces torch.cuda.synchronize)."""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from radar_depth_tpu.config import TrainConfig
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.metrics import (
    AverageMeter,
    accumulate_metric_sums,
    finalize_metrics,
    zeros_metric_sums,
)
from radar_depth_tpu.models import create_model
from radar_depth_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to,
    replicated_sharding,
    shard_batch,
)
from radar_depth_tpu.train import checkpoint as ckpt_lib
from radar_depth_tpu.train.state import TrainState, create_train_state, make_optimizer
from radar_depth_tpu.train.step import (
    init_model,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)
from radar_depth_tpu.utils.csvlog import EpochCSVLogger, write_best_txt
from radar_depth_tpu.utils.viz import comparison_panel, save_image


def make_datasets(cfg: TrainConfig):
    if cfg.data.dataset == "synthetic":
        spec = cfg.data.sample_spec()
        train = SyntheticNuScenes(cfg.data.num_train, spec=spec, seed=cfg.data.seed)
        val = SyntheticNuScenes(cfg.data.num_val, spec=spec, seed=cfg.data.seed + 1)
        return train, val
    if cfg.data.dataset == "packed":
        from radar_depth_tpu.data.packed import PackedDataset

        train = PackedDataset(os.path.join(cfg.data.data_root, "train"))
        val = PackedDataset(os.path.join(cfg.data.data_root, "val"))
        return train, val
    raise ValueError(cfg.data.dataset)


def iterate_batches(dataset, batch_size: int, shuffle: bool, seed: int,
                    drop_last: bool) -> Iterable[Dict]:
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        yield dataset.batch(order[i: i + batch_size])


class Trainer:
    """Builds model/optimizer/mesh once, runs epochs (upstream:main.py::main)."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.mesh = make_mesh()
        self.model, self.arch_spec = create_model(
            cfg.model.arch,
            modality=cfg.model.modality,
            decoder=cfg.model.decoder,
            output_size=(cfg.data.height, cfg.data.width),
            dtype=_dtype(cfg.model.dtype),
            **(
                dict(
                    filter_mode=cfg.model.filter_mode,
                    abs_threshold=cfg.model.abs_threshold,
                    rel_threshold=cfg.model.rel_threshold,
                )
                if "multistage" in cfg.model.arch
                else {}
            ),
        )
        self.train_ds, self.val_ds = make_datasets(cfg)
        steps_per_epoch = max(1, len(self.train_ds) // cfg.batch_size)
        self.tx = make_optimizer(cfg.optim, steps_per_epoch)

        key = jax.random.PRNGKey(cfg.seed)
        self.init_key, self.data_key = jax.random.split(key)
        variables = init_model(self.model, self.arch_spec, cfg, self.init_key)
        state = create_train_state(variables, self.tx)
        repl = replicated_sharding(self.mesh)
        self.state = jax.device_put(state, repl)

        bshard = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            make_train_step(self.model, self.arch_spec, cfg, self.tx),
            in_shardings=(repl, bshard, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(self.model, self.arch_spec, cfg),
            in_shardings=(repl, repl, bshard),
            out_shardings=repl,
        )
        self._predict = jax.jit(
            make_predict_fn(self.model, self.arch_spec, cfg),
            in_shardings=(repl, repl, bshard),
            out_shardings=bshard,
        )

        os.makedirs(cfg.output_dir, exist_ok=True)
        self.train_log = EpochCSVLogger(os.path.join(cfg.output_dir, "train.csv"))
        self.val_log = EpochCSVLogger(os.path.join(cfg.output_dir, "test.csv"))
        self.ckpt = ckpt_lib.CheckpointManager(cfg.output_dir)
        self.best_rmse = float("inf")
        self.start_epoch = 0

    # ------------------------------------------------------------- resume

    def maybe_resume(self):
        if self.cfg.resume:
            state, epoch = ckpt_lib.CheckpointManager(self.cfg.resume).restore(
                jax.tree_util.tree_map(np.asarray, self.state)
            )
            self.state = jax.device_put(state, replicated_sharding(self.mesh))
            self.start_epoch = epoch + 1
            print(f"resumed from {self.cfg.resume} at epoch {epoch}")

    def load_for_evaluate(self):
        state = ckpt_lib.restore_for_evaluate(
            self.cfg.evaluate, jax.tree_util.tree_map(np.asarray, self.state)
        )
        self.state = jax.device_put(state, replicated_sharding(self.mesh))

    # ------------------------------------------------------------- epochs

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        sums = zeros_metric_sums()
        loss_sum = 0.0
        nsteps = 0
        data_t, step_t = AverageMeter(), AverageMeter()
        key = jax.random.fold_in(self.data_key, epoch)
        t0 = time.perf_counter()
        for batch in iterate_batches(self.train_ds, cfg.batch_size, True,
                                     cfg.seed + epoch, drop_last=True):
            batch = shard_batch(batch, self.mesh)
            t1 = time.perf_counter()
            self.state, step_sums = self._train_step(self.state, batch, key)
            step_sums = jax.tree_util.tree_map(np.asarray, step_sums)
            t2 = time.perf_counter()
            loss_sum += float(step_sums.pop("loss"))
            sums = accumulate_metric_sums(sums, step_sums)
            data_t.update(t1 - t0)
            step_t.update(t2 - t1)
            nsteps += 1
            if nsteps % cfg.print_freq == 0:
                m = finalize_metrics(sums)
                print(f"epoch {epoch} step {nsteps}: loss={loss_sum / nsteps:.4f} "
                      f"rmse={m['rmse']:.3f} mae={m['mae']:.3f} "
                      f"data={data_t.average * 1e3:.0f}ms step={step_t.average * 1e3:.0f}ms")
            t0 = time.perf_counter()
        metrics = finalize_metrics(sums)
        metrics["loss"] = loss_sum / max(nsteps, 1)
        metrics["data_time"] = data_t.average
        metrics["gpu_time"] = step_t.average
        return metrics

    def validate(self, epoch: int = 0, viz: bool = True) -> Dict[str, float]:
        cfg = self.cfg
        sums = zeros_metric_sums()
        data_t, step_t = AverageMeter(), AverageMeter()
        t0 = time.perf_counter()
        first_batch = None
        for i, batch in enumerate(iterate_batches(self.val_ds, cfg.batch_size,
                                                  False, 0, drop_last=False)):
            batch, _ = pad_batch_to(batch, cfg.batch_size)
            batch = shard_batch(batch, self.mesh)
            if first_batch is None:
                first_batch = batch
            t1 = time.perf_counter()
            step_sums = self._eval_step(self.state.params, self.state.batch_stats,
                                        batch)
            step_sums = jax.tree_util.tree_map(np.asarray, step_sums)
            t2 = time.perf_counter()
            step_sums.pop("loss")
            sums = accumulate_metric_sums(sums, step_sums)
            data_t.update(t1 - t0)
            step_t.update(t2 - t1)
            t0 = time.perf_counter()
        metrics = finalize_metrics(sums)
        metrics["data_time"] = data_t.average
        metrics["gpu_time"] = step_t.average
        if viz and first_batch is not None:
            out = self._predict(self.state.params, self.state.batch_stats,
                                first_batch)
            panel = comparison_panel(
                jax.tree_util.tree_map(np.asarray, out),
                max_depth=cfg.data.max_depth,
            )
            save_image(panel, os.path.join(cfg.output_dir,
                                           f"comparison_epoch{epoch}.png"))
        return metrics

    def fit(self):
        cfg = self.cfg
        self.maybe_resume()
        for epoch in range(self.start_epoch, cfg.epochs):
            train_m = self.train_epoch(epoch)
            self.train_log.append(epoch, train_m)
            val_m = self.validate(epoch)
            self.val_log.append(epoch, val_m)
            print(f"epoch {epoch}: val rmse={val_m['rmse']:.4f} "
                  f"mae={val_m['mae']:.4f} d1={val_m['delta1']:.4f}")
            self.ckpt.save(epoch, jax.tree_util.tree_map(np.asarray, self.state),
                           val_m)
            if val_m["rmse"] < self.best_rmse:
                self.best_rmse = val_m["rmse"]
                write_best_txt(os.path.join(cfg.output_dir, "best.txt"),
                               epoch, val_m)
        self.ckpt.close()


def _dtype(name: str):
    import jax.numpy as jnp

    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
