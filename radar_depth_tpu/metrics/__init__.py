"""On-device depth metrics (upstream:metrics.py::Result / AverageMeter;
SURVEY.md §2 C9).

The reference computes, over the target>0 mask per batch, then averages across
batches with AverageMeter: irmse, imae (1/km), mse, rmse, mae (m), absrel,
lg10, δ<1.25 / 1.25² / 1.25³, plus data_time/gpu_time wall-clock fields.

TPU-native design: metrics are a flat pytree of float32 sums (plus the valid
counts needed to finish the averages), so sharded val batches reduce with a
single `psum` across the data mesh and the final divide happens once on host —
no per-batch host syncs (BASELINE.json: eval "runs on-device over batched val
shards").

Averaging convention: the reference's AverageMeter weights each *batch* by its
sample count (`meter.update(result, n=batch_size)`), i.e. each metric is first
averaged over valid pixels within a sample-batch, then averaged over batches.
We follow the same convention at sample granularity (per-sample pixel
average → mean over samples), which matches AverageMeter exactly when batch
sizes are uniform.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

METRIC_FIELDS = (
    "irmse", "imae", "mse", "rmse", "mae", "absrel", "lg10",
    "delta1", "delta2", "delta3",
)
CSV_FIELDS = ("mse", "rmse", "absrel", "lg10", "mae",
              "delta1", "delta2", "delta3", "data_time", "gpu_time")


def _per_sample_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over valid pixels per sample: (N, ...) → (N,). Safe on empty."""
    axes = tuple(range(1, x.ndim))
    total = jnp.sum(jnp.where(mask, x, 0.0), axis=axes)
    count = jnp.sum(mask, axis=axes)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0), count


def compute_metric_sums(pred: jax.Array, target: jax.Array) -> Dict[str, jax.Array]:
    """Per-sample metrics summed over the batch → scalar pytree of sums.

    Returns sums over samples with `count` = number of samples that had at
    least one valid pixel; divide by `count` to finish (see finalize_metrics).
    All math mirrors upstream:metrics.py::Result.evaluate: valid = target>0,
    inverse metrics in 1/km, lg10 = |log10 pred − log10 target|, δi =
    mean(max(pred/target, target/pred) < 1.25**i).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    valid = target > 0
    safe_pred = jnp.maximum(pred, 1e-6)  # guards log/division; masked anyway
    safe_target = jnp.where(valid, target, 1.0)

    abs_diff = jnp.abs(pred - target)
    sums = {}
    per = {}
    per["mse"], count = _per_sample_mean(jnp.square(pred - target), valid)
    per["mae"], _ = _per_sample_mean(abs_diff, valid)
    per["absrel"], _ = _per_sample_mean(abs_diff / safe_target, valid)
    per["lg10"], _ = _per_sample_mean(
        jnp.abs(jnp.log10(safe_pred) - jnp.log10(safe_target)), valid
    )
    max_ratio = jnp.maximum(safe_pred / safe_target, safe_target / safe_pred)
    per["delta1"], _ = _per_sample_mean((max_ratio < 1.25).astype(jnp.float32), valid)
    per["delta2"], _ = _per_sample_mean((max_ratio < 1.25**2).astype(jnp.float32), valid)
    per["delta3"], _ = _per_sample_mean((max_ratio < 1.25**3).astype(jnp.float32), valid)
    # Inverse metrics in 1/km (reference: inv_output_km = (1e-3 * pred_m)^-1,
    # i.e. 1000/depth_m — a 10 m return is 100 km^-1).
    inv_pred = 1.0 / (1e-3 * safe_pred)
    inv_target = 1.0 / (1e-3 * safe_target)
    per["imse"], _ = _per_sample_mean(jnp.square(inv_pred - inv_target), valid)
    per["imae"], _ = _per_sample_mean(jnp.abs(inv_pred - inv_target), valid)
    # rmse/irmse are per-sample sqrt of per-sample mse (reference convention:
    # Result.evaluate computes sqrt per evaluate() call, i.e. per batch).
    per["rmse"] = jnp.sqrt(per["mse"])
    per["irmse"] = jnp.sqrt(per["imse"])
    del per["imse"]

    has_valid = (count > 0).astype(jnp.float32)
    for name, val in per.items():
        sums[name] = jnp.sum(val * has_valid)
    sums["count"] = jnp.sum(has_valid)
    return sums


def zeros_metric_sums() -> Dict[str, jax.Array]:
    out = {k: jnp.zeros((), jnp.float32) for k in METRIC_FIELDS}
    out["count"] = jnp.zeros((), jnp.float32)
    return out


def accumulate_metric_sums(acc, new):
    """AverageMeter.update equivalent: running sums are just added."""
    return jax.tree_util.tree_map(lambda a, b: a + b, acc, new)


def finalize_metrics(sums: Dict[str, jax.Array]) -> Dict[str, float]:
    """Host-side finish: divide sums by sample count."""
    count = float(sums["count"])
    out = {}
    for k in METRIC_FIELDS:
        out[k] = float(sums[k]) / count if count > 0 else 0.0
    out["count"] = count
    return out


@dataclasses.dataclass
class AverageMeter:
    """Host-side running average for wall-clock fields (data_time/gpu_time),
    same contract as upstream:metrics.py::AverageMeter."""

    total: float = 0.0
    count: float = 0.0

    def update(self, value: float, n: int = 1) -> None:
        self.total += float(value) * n
        self.count += n

    @property
    def average(self) -> float:
        return self.total / self.count if self.count else 0.0


__all__ = [
    "METRIC_FIELDS",
    "CSV_FIELDS",
    "compute_metric_sums",
    "zeros_metric_sums",
    "accumulate_metric_sums",
    "finalize_metrics",
    "AverageMeter",
]
