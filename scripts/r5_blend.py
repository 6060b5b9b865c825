"""Brightness-conditional coarse/refined blend (VERDICT r4 #6): refinement
pays a severity-independent ~+1.4% day-RMSE tax — the one place it strictly
loses (NOTES.md Phase B). The two-stage model already computes BOTH heads in
one graph, so a pure elementwise output policy can choose per sample:
refined where the image is dark (radar carries unique signal), coarse where
bright (the image branch is already sufficient). This evaluates that policy
at eval time across a brightness-threshold sweep and reports
night/day/all RMSE for coarse / refined / blended.

The threshold is a TRACED scalar — one compile serves the whole sweep.

Usage:
  python scripts/r5_blend.py --run runs/s1_sd42_s2c \
      --data-root data/synth_s1_small --out results/r5/blend_sd42.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAUS = [0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40]


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
    from radar_depth_tpu.ops.preprocess import (
        PreprocessConfig,
        pack_model_inputs,
        prepare_eval_batch,
    )
    from radar_depth_tpu.parallel.mesh import pad_batch_to

    pred_obj = Predictor.from_run(args.run)
    cfg = pred_obj.cfg
    spec = cfg.data.sample_spec()
    pre = PreprocessConfig(spec=spec,
                           height_extension=cfg.data.height_extension,
                           raster_backend=cfg.data.raster_backend)

    @jax.jit
    def infer(params, batch_stats, batch, tau):
        prepared = prepare_eval_batch(batch, pre)
        inputs = pack_model_inputs(prepared, pred_obj.arch_spec.input_kind)
        out = pred_obj.model.apply(
            {"params": params, "batch_stats": batch_stats}, *inputs,
            train=False)
        coarse, refined = out[0], out[1]
        target = prepared["target"]
        # per-sample mean brightness of the (already [0,1]) rgb input
        bright = jnp.mean(prepared["rgb"], axis=(1, 2, 3))
        dark = (bright < tau)[:, None, None, None]
        blended = jnp.where(dark, refined, coarse)
        sums = {name: compute_metric_sums(arr, target, "batch")
                for name, arr in (("coarse", coarse), ("refined", refined),
                                  ("blended", blended))}
        return sums, jnp.sum(dark)

    ds = PackedDataset(os.path.join(args.data_root, "val"))
    splits = {"all": list(range(len(ds)))}
    for tag in ("night", "day"):
        idx = [i for i in range(len(ds)) if ds.sample_tag(i) == tag]
        if idx:
            splits[tag] = idx

    lines = [f"run={args.run} brightness-blend sweep val n={len(ds)}"]
    hdr = (f"{'tau':>5s} {'split':>6s} {'rmse C':>8s} {'rmse R':>8s} "
           f"{'rmse BLEND':>10s} {'mae BLEND':>9s} {'n_dark':>6s}")
    lines.append(hdr)
    rows = {}
    for tau in TAUS:
        rows[tau] = {}
        for split, indices in splits.items():
            sums_tot, dark_tot = None, 0
            for i0 in range(0, len(indices), args.batch):
                chunk = indices[i0:i0 + args.batch]
                batch, n_real = pad_batch_to(ds.batch(chunk), args.batch)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                sums, ndark = infer(pred_obj.params, pred_obj.batch_stats,
                                    batch, jnp.float32(tau))
                dark_tot += int(ndark)
                sums_tot = sums if sums_tot is None else \
                    jax.tree_util.tree_map(lambda a, b: a + b, sums_tot, sums)
            fin = {k: finalize_metrics(
                jax.tree_util.tree_map(np.asarray, v))
                for k, v in sums_tot.items()}
            rows[tau][split] = {k: {m: round(float(fin[k][m]), 5)
                                    for m in ("rmse", "mae", "absrel",
                                              "delta1")}
                                for k in fin}
            lines.append(
                f"{tau:5.2f} {split:>6s} {fin['coarse']['rmse']:8.4f} "
                f"{fin['refined']['rmse']:8.4f} "
                f"{fin['blended']['rmse']:10.4f} "
                f"{fin['blended']['mae']:9.4f} {dark_tot:6d}")
            print(lines[-1], flush=True)
    lines.append(json.dumps({str(k): v for k, v in rows.items()}))

    text = "\n".join(lines) + "\n"
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
