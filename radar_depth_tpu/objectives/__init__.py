"""Masked depth losses (upstream:criteria.py; SURVEY.md §2 C8).

The reference's MaskedMSELoss / MaskedL1Loss: mask = (target > 0), mean over
valid pixels only. The multistage loss sums per-stage masked losses
(weighting tagged [M] in the survey — configurable here, default 1:1).

All losses are pure jittable functions over (N, H, W, 1) float32 arrays and
reduce with float32 accumulation regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(err: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of err over mask, safe when the mask is empty (returns 0)."""
    err = err.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    total = jnp.sum(err * mask)
    count = jnp.sum(mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def masked_l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """upstream:criteria.py::MaskedL1Loss — mean |pred−target| over target>0."""
    mask = target > 0
    return _masked_mean(jnp.abs(pred - target), mask)


def masked_mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """upstream:criteria.py::MaskedMSELoss — mean (pred−target)² over target>0."""
    mask = target > 0
    diff = pred - target
    return _masked_mean(diff * diff, mask)


LOSSES = {"l1": masked_l1_loss, "l2": masked_mse_loss}


def get_loss(name: str):
    """Resolve --criterion {l1, l2} (upstream:utils.py::parse_command -c flag)."""
    if name not in LOSSES:
        raise KeyError(f"unknown criterion {name!r}; have {sorted(LOSSES)}")
    return LOSSES[name]


def multistage_loss(
    preds: tuple,
    target: jax.Array,
    criterion: str = "l1",
    stage_weights: tuple = (1.0, 1.0),
) -> jax.Array:
    """Sum of per-stage masked losses over (coarse, refined) predictions
    (SURVEY.md §3.4: loss = ℓ(D₁,gt) + ℓ(D₂,gt), weighting [M])."""
    fn = get_loss(criterion)
    total = 0.0
    for w, p in zip(stage_weights, preds):
        total = total + w * fn(p, target)
    return total


def multistage_uncertainty_loss(
    preds: tuple,
    log_var: jax.Array,
    target: jax.Array,
    criterion: str = "l1",
) -> jax.Array:
    """Uncertainty-weighted multistage loss: Σ_i exp(−s_i)·ℓ_i(Dᵢ,gt) + s_i
    with learned per-stage log-variances s (Kendall et al. 2018 homoscedastic
    weighting). SPECULATIVE parity surface — the reference possibly ships
    `*_multistage_uncertainty*` archs (SURVEY.md §2 C7 [M]); formula to be
    re-checked when /root/reference is readable."""
    fn = get_loss(criterion)
    total = 0.0
    for i, p in enumerate(preds):
        s = log_var[i].astype(jnp.float32)
        total = total + jnp.exp(-s) * fn(p, target) + s
    return total


__all__ = [
    "masked_l1_loss",
    "masked_mse_loss",
    "multistage_loss",
    "multistage_uncertainty_loss",
    "get_loss",
    "LOSSES",
]
