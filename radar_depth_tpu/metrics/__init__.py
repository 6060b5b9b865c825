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
The default (`--metric-avg batch`) reproduces that convention exactly; the
opt-in `sample` granularity (per-sample pixel average → mean over samples)
is padding-exact and matches AverageMeter when batch sizes are uniform.
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


def compute_metric_sums(pred: jax.Array, target: jax.Array,
                        convention: str = "sample") -> Dict[str, jax.Array]:
    """Per-batch metrics → scalar pytree of sums (finish with
    finalize_metrics: metric = sum / count).

    convention="sample" (default): per-sample pixel means summed over samples,
    count = samples with ≥1 valid pixel. Exact under padded/ragged eval tails.

    convention="batch": the reference's AverageMeter weighting EXACTLY
    (upstream:metrics.py::Result.evaluate pools ALL valid pixels of the batch
    into one value; AverageMeter.update(result, n=batch_size) then weights by
    batch size — so rmse is the mean of per-batch sqrt values). Implemented as
    batch-pooled value × n summed, count = n. Padding samples (all-invalid
    target) are excluded from n, which matches the reference on its own data
    (it never pads) while keeping our padded tails exact.

    All metric math mirrors upstream:metrics.py::Result.evaluate:
    valid = target>0, inverse metrics in 1/km, lg10 = |log10 pred − log10
    target|, δi = mean(max(pred/target, target/pred) < 1.25**i).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    valid = target > 0
    safe_pred = jnp.maximum(pred, 1e-6)  # guards log/division; masked anyway
    safe_target = jnp.where(valid, target, 1.0)

    if convention == "batch":
        mean = _pooled_mean_fn(valid)
    elif convention == "sample":
        mean = None
    else:
        raise ValueError(f"unknown metric convention {convention!r}")

    def per_mean(x):
        if mean is not None:
            return mean(x), None
        return _per_sample_mean(x, valid)

    abs_diff = jnp.abs(pred - target)
    sums = {}
    per = {}
    per["mse"], count = per_mean(jnp.square(pred - target))
    per["mae"], _ = per_mean(abs_diff)
    per["absrel"], _ = per_mean(abs_diff / safe_target)
    per["lg10"], _ = per_mean(
        jnp.abs(jnp.log10(safe_pred) - jnp.log10(safe_target))
    )
    max_ratio = jnp.maximum(safe_pred / safe_target, safe_target / safe_pred)
    per["delta1"], _ = per_mean((max_ratio < 1.25).astype(jnp.float32))
    per["delta2"], _ = per_mean((max_ratio < 1.25**2).astype(jnp.float32))
    per["delta3"], _ = per_mean((max_ratio < 1.25**3).astype(jnp.float32))
    # Inverse metrics in 1/km (reference: inv_output_km = (1e-3 * pred_m)^-1,
    # i.e. 1000/depth_m — a 10 m return is 100 km^-1).
    inv_pred = 1.0 / (1e-3 * safe_pred)
    inv_target = 1.0 / (1e-3 * safe_target)
    per["imse"], _ = per_mean(jnp.square(inv_pred - inv_target))
    per["imae"], _ = per_mean(jnp.abs(inv_pred - inv_target))
    # rmse/irmse: sqrt of the mse at the evaluate() granularity (per sample
    # for convention="sample", per batch for convention="batch" — the
    # reference computes sqrt once per Result.evaluate call).
    per["rmse"] = jnp.sqrt(per["mse"])
    per["irmse"] = jnp.sqrt(per["imse"])
    del per["imse"]

    if convention == "batch":
        # one pooled value per batch, weighted by the (non-padding) batch size
        axes = tuple(range(1, valid.ndim))
        n = jnp.sum(jnp.any(valid, axis=axes).astype(jnp.float32))
        for name, val in per.items():
            sums[name] = val * n
        sums["count"] = n
        return sums

    has_valid = (count > 0).astype(jnp.float32)
    for name, val in per.items():
        sums[name] = jnp.sum(val * has_valid)
    sums["count"] = jnp.sum(has_valid)
    return sums


def _pooled_mean_fn(valid: jax.Array):
    """Mean over every valid pixel in the whole batch (reference
    Result.evaluate semantics)."""
    count = jnp.sum(valid)

    def mean(x):
        total = jnp.sum(jnp.where(valid, x, 0.0))
        return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    return mean


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
