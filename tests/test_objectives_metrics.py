"""Masked losses and Result-equivalent metrics vs hand-computed numpy oracles
(SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from radar_depth_tpu.objectives import (
    masked_l1_loss,
    masked_mse_loss,
    multistage_loss,
    get_loss,
)
from radar_depth_tpu.metrics import (
    compute_metric_sums,
    zeros_metric_sums,
    accumulate_metric_sums,
    finalize_metrics,
    AverageMeter,
    METRIC_FIELDS,
)

RNG = np.random.default_rng(2)


def _fixture(n=3, h=8, w=10):
    pred = RNG.uniform(1, 60, size=(n, h, w, 1)).astype(np.float32)
    target = RNG.uniform(1, 60, size=(n, h, w, 1)).astype(np.float32)
    target[RNG.uniform(size=target.shape) < 0.6] = 0.0  # sparse GT
    return pred, target


def test_masked_losses_match_numpy():
    pred, target = _fixture()
    mask = target > 0
    want_l1 = np.abs(pred - target)[mask].mean()
    want_l2 = ((pred - target) ** 2)[mask].mean()
    np.testing.assert_allclose(float(masked_l1_loss(jnp.asarray(pred), jnp.asarray(target))), want_l1, rtol=1e-5)
    np.testing.assert_allclose(float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(target))), want_l2, rtol=1e-5)
    assert get_loss("l1") is masked_l1_loss and get_loss("l2") is masked_mse_loss


def test_masked_loss_empty_mask_is_zero_and_finite_grad():
    import jax

    pred = jnp.ones((1, 4, 4, 1))
    target = jnp.zeros((1, 4, 4, 1))
    assert float(masked_l1_loss(pred, target)) == 0.0
    g = jax.grad(lambda p: masked_l1_loss(p, target))(pred)
    assert np.isfinite(np.asarray(g)).all()


def test_multistage_loss_is_weighted_sum():
    pred, target = _fixture(1)
    coarse = pred + 1.0
    got = float(multistage_loss((jnp.asarray(coarse), jnp.asarray(pred)),
                                jnp.asarray(target), "l1", (0.5, 1.0)))
    want = 0.5 * float(masked_l1_loss(jnp.asarray(coarse), jnp.asarray(target))) + \
           float(masked_l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def metrics_oracle(pred, target):
    """Per-sample → mean over samples, mirroring Result/AverageMeter."""
    out = {k: [] for k in METRIC_FIELDS}
    for i in range(pred.shape[0]):
        p, t = pred[i], target[i]
        m = t > 0
        if not m.any():
            continue
        p, t = p[m], t[m]
        out["mse"].append(np.mean((p - t) ** 2))
        out["rmse"].append(np.sqrt(np.mean((p - t) ** 2)))
        out["mae"].append(np.mean(np.abs(p - t)))
        out["absrel"].append(np.mean(np.abs(p - t) / t))
        out["lg10"].append(np.mean(np.abs(np.log10(p) - np.log10(t))))
        ratio = np.maximum(p / t, t / p)
        out["delta1"].append(np.mean(ratio < 1.25))
        out["delta2"].append(np.mean(ratio < 1.25**2))
        out["delta3"].append(np.mean(ratio < 1.25**3))
        ip, it = 1.0 / (1e-3 * p), 1.0 / (1e-3 * t)
        out["imae"].append(np.mean(np.abs(ip - it)))
        out["irmse"].append(np.sqrt(np.mean((ip - it) ** 2)))
    return {k: float(np.mean(v)) for k, v in out.items()}


def test_metrics_match_oracle_across_batches():
    acc = zeros_metric_sums()
    all_p, all_t = [], []
    for _ in range(3):
        pred, target = _fixture(4)
        acc = accumulate_metric_sums(
            acc, compute_metric_sums(jnp.asarray(pred), jnp.asarray(target)))
        all_p.append(pred)
        all_t.append(target)
    got = finalize_metrics(acc)
    want = metrics_oracle(np.concatenate(all_p), np.concatenate(all_t))
    assert got["count"] == 12
    for k in METRIC_FIELDS:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-5, err_msg=k)


def test_batch_convention_matches_averagemeter_oracle():
    """convention='batch' reproduces the reference loop exactly: per batch,
    Result.evaluate pools ALL valid pixels; AverageMeter.update(result, n)
    weights by batch size; rmse averages the per-batch sqrt values
    (upstream:metrics.py; VERDICT r1 weak #7)."""
    acc = zeros_metric_sums()
    meter = {k: [0.0, 0.0] for k in METRIC_FIELDS}  # [weighted sum, n]
    for i in range(3):
        n = [2, 4, 3][i]  # ragged batch sizes — where the conventions differ
        pred, target = _fixture(n)
        acc = accumulate_metric_sums(
            acc, compute_metric_sums(jnp.asarray(pred), jnp.asarray(target),
                                     convention="batch"))
        m = target > 0
        d = pred[m] - target[m]
        ip, it = 1.0 / (1e-3 * pred[m]), 1.0 / (1e-3 * target[m])
        ratio = np.maximum(pred[m] / target[m], target[m] / pred[m])
        batch_val = {
            "mse": np.mean(d**2), "rmse": np.sqrt(np.mean(d**2)),
            "mae": np.mean(np.abs(d)),
            "absrel": np.mean(np.abs(d) / target[m]),
            "lg10": np.mean(np.abs(np.log10(pred[m]) - np.log10(target[m]))),
            "delta1": np.mean(ratio < 1.25), "delta2": np.mean(ratio < 1.25**2),
            "delta3": np.mean(ratio < 1.25**3),
            "imae": np.mean(np.abs(ip - it)),
            "irmse": np.sqrt(np.mean((ip - it) ** 2)),
        }
        for k in METRIC_FIELDS:
            meter[k][0] += batch_val[k] * n
            meter[k][1] += n
    got = finalize_metrics(acc)
    assert got["count"] == 9
    for k in METRIC_FIELDS:
        np.testing.assert_allclose(got[k], meter[k][0] / meter[k][1],
                                    rtol=2e-5, err_msg=k)


def test_batch_convention_excludes_padding():
    pred = np.full((3, 4, 4, 1), 10.0, np.float32)
    target = np.zeros((3, 4, 4, 1), np.float32)
    target[0] = 10.0
    target[1] = 20.0  # sample 2 is all-invalid (an eval padding row)
    s = compute_metric_sums(jnp.asarray(pred), jnp.asarray(target),
                            convention="batch")
    got = finalize_metrics(s)
    assert got["count"] == 2
    np.testing.assert_allclose(got["rmse"], np.sqrt((0 + 100) / 2), rtol=1e-6)


def test_metrics_skip_empty_samples():
    pred = np.ones((2, 4, 4, 1), np.float32) * 10
    target = np.zeros((2, 4, 4, 1), np.float32)
    target[0, 1, 1, 0] = 10.0  # sample 0 has one valid px, sample 1 none
    s = compute_metric_sums(jnp.asarray(pred), jnp.asarray(target))
    got = finalize_metrics(s)
    assert got["count"] == 1
    assert got["rmse"] == 0.0 and got["delta1"] == 1.0


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    np.testing.assert_allclose(m.average, 2.0)


def test_multistage_uncertainty_loss_formula():
    """Kendall weighting: sum_i exp(-s_i)*l_i + s_i (speculative parity
    surface behind --multistage-uncertainty; SURVEY.md §2 C7 [M])."""
    import jax.numpy as jnp

    from radar_depth_tpu.objectives import (
        masked_l1_loss,
        multistage_uncertainty_loss,
    )

    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.uniform(0, 10, (2, 8, 8, 1)).astype(np.float32))
    p1 = jnp.asarray(rng.uniform(0, 10, (2, 8, 8, 1)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform(0, 10, (2, 8, 8, 1)).astype(np.float32))
    s = jnp.asarray([0.3, -0.2], np.float32)
    got = float(multistage_uncertainty_loss((p1, p2), s, target, "l1"))
    l1 = float(masked_l1_loss(p1, target))
    l2 = float(masked_l1_loss(p2, target))
    want = np.exp(-0.3) * l1 + 0.3 + np.exp(0.2) * l2 - 0.2
    np.testing.assert_allclose(got, want, rtol=1e-6)
