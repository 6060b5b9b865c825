"""Train state + optimizer matching the reference's SGD semantics.

torch.optim.SGD (upstream:main.py: lr, momentum=0.9, weight_decay) couples
weight decay into the gradient *before* the momentum buffer:
    g ← g + wd·p ;  v ← μ·v + g ;  p ← p − lr·v
optax equivalent: chain(add_decayed_weights(wd), sgd(lr_schedule, momentum)) —
verified against a torch oracle in tests/test_train.py. LR follows the
reference's step decay: lr·factor^(epoch // decay_epochs)
(upstream:utils.py::adjust_learning_rate; SURVEY.md §2 C12).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from radar_depth_tpu.config import OptimConfig


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def step_decay_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """lr(step) = lr0 · factor^(epoch // decay_epochs)."""
    decay_steps = max(1, cfg.lr_decay_epochs * steps_per_epoch)

    def schedule(step):
        return cfg.lr * cfg.lr_decay_factor ** (step // decay_steps)

    return schedule


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(step_decay_schedule(cfg, steps_per_epoch), momentum=cfg.momentum),
    )


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
