"""Jitted train / eval step builders.

One call = the whole per-batch pipeline of the reference's hot loops
(upstream:main.py::train / validate; SURVEY.md §3.1/§3.2) fused into a single
XLA program: on-device preprocessing+augmentation → forward (+ two-stage radar
filtering) → masked loss → backward → SGD update → on-device metric sums.
Raw schema batches go in; only scalars come back out.

Sharding: steps are written in global semantics; the caller jits them with the
batch sharded over the data mesh and state replicated (parallel/mesh.py), and
GSPMD inserts the cross-chip psums for loss/metric reductions.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from radar_depth_tpu.config import TrainConfig
from radar_depth_tpu.metrics import compute_metric_sums
from radar_depth_tpu.models import ArchSpec
from radar_depth_tpu.objectives import (
    get_loss,
    multistage_loss,
    multistage_uncertainty_loss,
)
from radar_depth_tpu.ops.preprocess import (
    PreprocessConfig,
    pack_model_inputs,
    prepare_eval_batch,
    prepare_train_batch,
)
from radar_depth_tpu.train.state import TrainState


def make_preprocess_config(cfg: TrainConfig) -> PreprocessConfig:
    return PreprocessConfig(
        spec=cfg.data.sample_spec(),
        height_extension=cfg.data.height_extension,
        augment=cfg.augment,
        sparsifier=cfg.data.sparsifier,
        num_samples=cfg.data.num_samples,
        raster_backend=cfg.data.raster_backend,
        gt_augment=cfg.data.gt_augment,
    )


def _forward(model, spec: ArchSpec, variables, prepared, cfg: TrainConfig,
             train: bool, mutable):
    inputs = pack_model_inputs(prepared, spec.input_kind, cfg.model.modality)
    out = model.apply(variables, *inputs, train=train, mutable=mutable)
    return out


def _loss_and_pred(out, target, cfg: TrainConfig, spec: ArchSpec,
                   rgb=None):
    """``rgb`` (eval paths only): enables the --blend-tau output policy —
    the emitted pred is blend_by_brightness(coarse, refined) so validation,
    best-model selection and viz all score the DEPLOYED output. Training
    loss is unaffected (always the multistage sum over both heads)."""
    if spec.multistage:
        if len(out) == 3:  # (coarse, refined, stage_log_var) — uncertainty
            loss = multistage_uncertainty_loss(out[:2], out[2], target,
                                               cfg.optim.criterion)
        else:
            loss = multistage_loss(out, target, cfg.optim.criterion,
                                   cfg.optim.stage_weights)
        pred = out[1]
        if rgb is not None and cfg.model.blend_tau > 0:
            from radar_depth_tpu.models.fusion import blend_by_brightness

            pred = blend_by_brightness(out[0], out[1], rgb,
                                       cfg.model.blend_tau)
    else:
        loss = get_loss(cfg.optim.criterion)(out, target)
        pred = out
    return loss, pred


def make_micro_grad_fn(model, spec: ArchSpec, cfg: TrainConfig,
                       host_augmented: bool = False, mesh=None) -> Callable:
    """One micro-batch of the train step WITHOUT the optimizer update:
    (params, batch_stats, batch, key) -> (grads, new_batch_stats, sums).
    Shared by the plain train step (one micro-batch per update) and the
    gradient-accumulation scan; also the oracle surface for
    tests/test_grad_accum.py.

    ``mesh``: when it carries a 'space' axis (--spatial), the prepared NHWC
    tensors are sharding-constrained along image height so GSPMD spatially
    partitions the conv stack (parallel/mesh.py::spatial_constraint)."""
    from radar_depth_tpu.parallel.mesh import spatial_constraint

    pre_cfg = make_preprocess_config(cfg)

    def micro_grads(params, batch_stats, batch: Dict, key: jax.Array):
        if host_augmented:
            prepared = prepare_eval_batch(batch, pre_cfg, key)
        else:
            prepared = prepare_train_batch(batch, pre_cfg, key)
        prepared = spatial_constraint(prepared, mesh)
        target = prepared["target"]

        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            out, mut = _forward(model, spec, variables, prepared, cfg,
                                train=True, mutable=["batch_stats"])
            loss, pred = _loss_and_pred(out, target, cfg, spec)
            return loss, (mut["batch_stats"], pred)

        (loss, (new_stats, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        sums = compute_metric_sums(pred, target, cfg.metric_avg)
        sums["loss"] = loss.astype(jnp.float32)
        return grads, new_stats, sums

    return micro_grads


def make_train_step(model, spec: ArchSpec, cfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    host_augmented: bool = False, mesh=None) -> Callable:
    """host_augmented=True: batches were already augmented by the native
    loader's worker threads (warps + geometry folded into
    intrinsics/transforms — data/packed.py NativeBatchLoader(augment=...)),
    so the device step runs the eval-style preprocessing only. This removes
    ~0.9 s/step of XLA gather warps at B=32 and overlaps augmentation with
    device compute, exactly like the reference's DataLoader workers
    (upstream:main.py::create_data_loaders; SURVEY.md §3.1 process
    boundary).

    cfg.optim.grad_accum > 1: the step consumes a STACKED batch whose leaves
    are (grad_accum, batch, ...) and runs a lax.scan over the micro-batch
    axis — per micro-batch gradients accumulate (then average) and BN stats
    thread sequentially, followed by ONE optimizer update. Exact SGD on the
    averaged gradient; RNG folds (step, micro_index) so micro-batches draw
    independent augmentations. The reported loss sum is divided by
    grad_accum so its scale matches the plain step."""
    micro_grads = make_micro_grad_fn(model, spec, cfg, host_augmented,
                                     mesh=mesh)
    accum = max(1, cfg.optim.grad_accum)

    def apply_update(state: TrainState, grads, batch_stats) -> TrainState:
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params,
            batch_stats=batch_stats, opt_state=opt_state,
        )

    if accum == 1:
        def train_step(state: TrainState, batch: Dict, key: jax.Array
                       ) -> Tuple[TrainState, Dict]:
            key = jax.random.fold_in(key, state.step)
            grads, batch_stats, sums = micro_grads(
                state.params, state.batch_stats, batch, key)
            return apply_update(state, grads, batch_stats), sums

        return train_step

    def train_step(state: TrainState, batch: Dict, key: jax.Array
                   ) -> Tuple[TrainState, Dict]:
        key = jax.random.fold_in(key, state.step)

        def body(carry, xs):
            batch_stats, grads_acc, sums_acc = carry
            micro_batch, idx = xs
            grads, batch_stats, sums = micro_grads(
                state.params, batch_stats, micro_batch,
                jax.random.fold_in(key, idx))
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g, grads_acc, grads)
            sums_acc = jax.tree_util.tree_map(
                lambda a, s: a + s, sums_acc, sums)
            return (batch_stats, grads_acc, sums_acc), None

        grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # Zero sums with the exact structure one micro-batch produces
        # (metric fields depend on cfg.metric_avg; "loss" is added on top).
        sums0 = jax.eval_shape(
            lambda: micro_grads(
                state.params, state.batch_stats,
                jax.tree_util.tree_map(lambda x: x[0], batch), key)[2])
        sums0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), sums0)
        (batch_stats, grads_acc, sums), _ = jax.lax.scan(
            body, (state.batch_stats, grads0, sums0),
            (batch, jnp.arange(accum)))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads_acc)
        sums["loss"] = sums["loss"] / accum
        return apply_update(state, grads, batch_stats), sums

    return train_step


def make_eval_step(model, spec: ArchSpec, cfg: TrainConfig,
                   mesh=None) -> Callable:
    from radar_depth_tpu.parallel.mesh import spatial_constraint

    pre_cfg = make_preprocess_config(cfg)

    def eval_step(params, batch_stats, batch: Dict) -> Dict:
        prepared = spatial_constraint(prepare_eval_batch(batch, pre_cfg),
                                      mesh)
        variables = {"params": params, "batch_stats": batch_stats}
        out = _forward(model, spec, variables, prepared, cfg,
                       train=False, mutable=False)
        loss, pred = _loss_and_pred(out, prepared["target"], cfg, spec,
                                    rgb=prepared["rgb"])
        sums = compute_metric_sums(pred, prepared["target"], cfg.metric_avg)
        sums["loss"] = loss.astype(jnp.float32)
        return sums

    return eval_step


def make_predict_fn(model, spec: ArchSpec, cfg: TrainConfig) -> Callable:
    """Full-resolution prediction (for viz panels / inference benchmarks):
    returns {rgb, radar, target, pred} all at (B, H, W, ·)."""
    pre_cfg = make_preprocess_config(cfg)

    def predict(params, batch_stats, batch: Dict) -> Dict:
        prepared = prepare_eval_batch(batch, pre_cfg)
        variables = {"params": params, "batch_stats": batch_stats}
        out = _forward(model, spec, variables, prepared, cfg,
                       train=False, mutable=False)
        _, pred = _loss_and_pred(out, prepared["target"], cfg, spec,
                                 rgb=prepared["rgb"])
        return dict(prepared, pred=pred)

    return predict


def init_model(model, spec: ArchSpec, cfg: TrainConfig, key: jax.Array):
    """Initialize variables with a dummy batch of the working resolution."""
    h, w = cfg.data.height, cfg.data.width
    rgb = jnp.zeros((1, h, w, 3), jnp.float32)
    radar = jnp.zeros((1, h, w, 1), jnp.float32)
    prepared = {"rgb": rgb, "radar": radar}
    inputs = pack_model_inputs(prepared, spec.input_kind, cfg.model.modality)
    return model.init(key, *inputs, train=False)
