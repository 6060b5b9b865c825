"""Filter-threshold sweep (VERDICT r4 #2): the radar outlier filter's
threshold is the paper's core mechanism and SURVEY.md §3.4 tags both the
rule AND its value [M]; today's defaults (abs=2.0 m, rel=0.15) drop 55-63%
of CLEAN night radar (false positives, r4 efficacy rows) and were never
varied. This sweeps (mode, abs, rel) at EVAL time over an existing two-stage
checkpoint — thresholds are runtime config, the checkpoint's weights were
trained at rel=0.15 — and reports per-cell night/day/all coarse-vs-refined
metrics plus filter efficacy, so a better operating point (if any) is
located before paying for a retrain at that point.

Usage:
  python scripts/r5_filter_sweep.py --run runs/s1_sd42_s2c \
      --data-root data/synth_s1_small --out results/r5/filter_sweep_sd42.txt

One process: params load once, each cell re-jits only the (threshold-
constant) inference graph; the coarse branch is threshold-independent and
reported once.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [
    # (mode, abs_t, rel_t) — abs sweep, rel sweep, and two 'or' combos
    ("abs", 1.0, 0.15), ("abs", 2.0, 0.15), ("abs", 4.0, 0.15),
    ("rel", 2.0, 0.05), ("rel", 2.0, 0.10), ("rel", 2.0, 0.15),
    ("rel", 2.0, 0.25),
    ("or", 2.0, 0.15), ("or", 1.0, 0.05),
]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="")
    p.add_argument("--platform", default="default", choices=["default", "cpu"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from radar_depth_tpu.data.packed import PackedDataset
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.metrics import compute_metric_sums, finalize_metrics
    from radar_depth_tpu.models.fusion import filter_radar_by_prediction
    from radar_depth_tpu.ops.preprocess import (
        PreprocessConfig,
        pack_model_inputs,
        prepare_eval_batch,
    )
    from radar_depth_tpu.parallel.mesh import pad_batch_to

    base = Predictor.from_run(args.run)
    cfg0 = base.cfg
    spec = cfg0.data.sample_spec()
    pre = PreprocessConfig(spec=spec,
                           height_extension=cfg0.data.height_extension,
                           raster_backend=cfg0.data.raster_backend)

    ds = PackedDataset(os.path.join(args.data_root, "val"))
    splits = {"all": list(range(len(ds)))}
    for tag in ("night", "day"):
        idx = [i for i in range(len(ds)) if ds.sample_tag(i) == tag]
        if idx:
            splits[tag] = idx

    def eval_cell(pred_obj, mode, abs_t, rel_t):
        @jax.jit
        def infer(params, batch_stats, batch):
            prepared = prepare_eval_batch(batch, pre)
            inputs = pack_model_inputs(prepared,
                                       pred_obj.arch_spec.input_kind)
            out = pred_obj.model.apply(
                {"params": params, "batch_stats": batch_stats}, *inputs,
                train=False)
            coarse, refined = out[0], out[1]
            radar, target = prepared["radar"], prepared["target"]
            kept = filter_radar_by_prediction(
                radar, coarse, abs_threshold=abs_t, rel_threshold=rel_t,
                mode=mode) > 0
            has_gt = (radar > 0) & (target > 0)
            err = jnp.abs(radar - target)
            corrupt = has_gt & (err > 2.0) & (
                err / jnp.maximum(target, 1e-3) > 0.15)
            clean = has_gt & ~corrupt
            eff = {
                "corrupt_px": jnp.sum(corrupt),
                "corrupt_kept": jnp.sum(corrupt & kept),
                "clean_px": jnp.sum(clean),
                "clean_kept": jnp.sum(clean & kept),
            }
            return coarse, refined, target, eff

        results = {}
        for split, indices in splits.items():
            sums = {"coarse": None, "refined": None}
            eff_tot = None
            for i0 in range(0, len(indices), args.batch):
                chunk = indices[i0:i0 + args.batch]
                batch, _ = pad_batch_to(ds.batch(chunk), args.batch)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                coarse, refined, target, eff = infer(
                    pred_obj.params, pred_obj.batch_stats, batch)
                eff_tot = eff if eff_tot is None else jax.tree_util.tree_map(
                    lambda a, b: a + b, eff_tot, eff)
                for name, arr in (("coarse", coarse), ("refined", refined)):
                    s = compute_metric_sums(arr, target, "batch")
                    sums[name] = s if sums[name] is None else \
                        jax.tree_util.tree_map(lambda a, b: a + b,
                                               sums[name], s)
            fin = {k: finalize_metrics(
                jax.tree_util.tree_map(np.asarray, v))
                for k, v in sums.items()}
            e = {k: int(v) for k, v in jax.tree_util.tree_map(
                np.asarray, eff_tot).items()}
            fin["eff"] = {
                "corrupt_drop": 1 - e["corrupt_kept"] / max(e["corrupt_px"], 1),
                "clean_drop": 1 - e["clean_kept"] / max(e["clean_px"], 1),
            }
            results[split] = fin
        return results

    lines = [f"run={args.run} (trained filter={cfg0.model.filter_mode} "
             f"abs={cfg0.model.abs_threshold} rel={cfg0.model.rel_threshold})"
             f" val n={len(ds)}; eval-time threshold sweep"]
    hdr = (f"{'cell':16s} {'n.rmse C':>9s} {'n.rmse R':>9s} {'n.mae R':>8s} "
           f"{'d.rmse R':>9s} {'a.rmse R':>9s} {'n.cor.drop':>10s} "
           f"{'n.cln.drop':>10s}")
    lines.append(hdr)
    rows = {}
    for mode, abs_t, rel_t in CELLS:
        cell_cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(
                cfg0.model, filter_mode=mode, abs_threshold=abs_t,
                rel_threshold=rel_t))
        pred_obj = Predictor(cell_cfg, base.params, base.batch_stats)
        res = eval_cell(pred_obj, mode, abs_t, rel_t)
        tag = f"{mode} a={abs_t:g} r={rel_t:g}"
        n = res.get("night", res["all"])
        d = res.get("day", res["all"])
        a = res["all"]
        lines.append(
            f"{tag:16s} {n['coarse']['rmse']:9.4f} {n['refined']['rmse']:9.4f}"
            f" {n['refined']['mae']:8.4f} {d['refined']['rmse']:9.4f}"
            f" {a['refined']['rmse']:9.4f} {n['eff']['corrupt_drop']:10.1%}"
            f" {n['eff']['clean_drop']:10.1%}")
        rows[tag] = {s: {o: {m: round(float(res[s][o][m]), 5)
                             for m in ("rmse", "mae", "absrel", "delta1")}
                         for o in ("coarse", "refined")}
                     | {"eff": {k: round(v, 4)
                                for k, v in res[s]["eff"].items()}}
                     for s in res}
        print(lines[-1], flush=True)
    lines.append(json.dumps(rows))

    text = "\n".join(lines) + "\n"
    sys.stdout.write(text.split("\n")[0] + "\n")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    else:
        sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
