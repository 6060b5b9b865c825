"""Coarse-vs-refined evaluation of a trained two-stage run (VERDICT r2 #2
evidence): computes the full metric set for BOTH MultiStageNet outputs
(D1 = coarse stage-1 depth, D2 = refined stage-2 depth after radar outlier
filtering — SURVEY.md §3.4) on a packed val split, plus per-pixel evidence:
the same metrics restricted to pixels NEAR PROJECTED RADAR RETURNS, where
the filter actually acts. If the filter pays, D2 < D1 overall and the gap
widens on radar-local pixels.

Usage:
  python scripts/eval_two_stage.py --run /tmp/r3_ms_abs --data-root /tmp/r3data \
      [--filter-mode abs] [--batch 32] [--height 450 --width 800 --sweeps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--data-root", required=True)
    # Model/data flags default to the run's own config.json (self-describing
    # run dirs) — pass them only to OVERRIDE. This matters for correctness,
    # not just convenience: the stage-2 filter has no parameters, so
    # restoring a rel-filter run into an abs-filter graph would silently
    # produce wrong refined outputs and keep-masks.
    p.add_argument("--arch", default=None,
                   help="override the run's arch "
                        "(e.g. resnet18_multistage_uncertainty)")
    p.add_argument("--decoder", default=None,
                   choices=["deconv2", "deconv3", "upconv", "upproj"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--sweeps", type=int, default=None)
    p.add_argument("--dtype", default=None)
    p.add_argument("--filter-mode", default=None, choices=["abs", "rel", "or"])
    p.add_argument("--stage2-coarse", action="store_true", default=None,
                   help="the run used --stage2-coarse (D1 as a stage-2 "
                        "radar-branch channel)")
    p.add_argument("--abs-threshold", type=float, default=None)
    p.add_argument("--rel-threshold", type=float, default=None)
    p.add_argument("--radius", type=int, default=4,
                   help="pixels around each projected radar return counted "
                        "as 'radar-local' for the per-pixel breakdown")
    p.add_argument("--metric-avg", default="batch",
                   choices=["batch", "sample"],
                   help="averaging convention; 'batch' matches the trainer "
                        "CSVs / reference AverageMeter")
    p.add_argument("--split", default="",
                   help="restrict to one tag from the val tags sidecar "
                        "(e.g. day / night); comma-separated tags evaluate "
                        "each split IN ONE PROCESS (the jitted graphs "
                        "compile once — on the bench relay a compile costs "
                        "minutes, so 'all,night,day' is ~3x faster than "
                        "three invocations); 'all' means the whole set")
    p.add_argument("--out-prefix", default="",
                   help="with multiple --split tags: also write each "
                        "split's report to <out-prefix><split>.txt")
    p.add_argument("--platform", default="default", choices=["default", "cpu"],
                   help="force the jax backend; 'cpu' evaluates off-TPU "
                        "(the axon plugin ignores JAX_PLATFORMS)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
    from radar_depth_tpu.data.packed import PackedDataset
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.metrics import compute_metric_sums, finalize_metrics
    from radar_depth_tpu.ops.preprocess import (
        PreprocessConfig,
        pack_model_inputs,
        prepare_eval_batch,
    )

    stored = None
    cfg_path = os.path.join(args.run, "config.json")
    if os.path.isfile(cfg_path):
        from radar_depth_tpu.config import load_config

        stored = load_config(cfg_path)

    def pick(cli, field, default):
        if cli is not None:
            return cli
        if stored is not None:
            section, name = field
            return getattr(getattr(stored, section), name)
        return default

    args.arch = pick(args.arch, ("model", "arch"), "resnet18_multistage")
    args.decoder = pick(args.decoder, ("model", "decoder"), "upproj")
    args.dtype = pick(args.dtype, ("model", "dtype"), "bfloat16")
    args.filter_mode = pick(args.filter_mode, ("model", "filter_mode"), "abs")
    args.abs_threshold = pick(args.abs_threshold,
                              ("model", "abs_threshold"), 2.0)
    args.rel_threshold = pick(args.rel_threshold,
                              ("model", "rel_threshold"), 0.15)
    args.stage2_coarse = bool(pick(args.stage2_coarse,
                                   ("model", "stage2_coarse"), False))
    args.height = pick(args.height, ("data", "height"), 450)
    args.width = pick(args.width, ("data", "width"), 800)
    args.sweeps = pick(args.sweeps, ("data", "num_sweeps"), 5)
    height_extension = pick(None, ("data", "height_extension"), 0)
    raster_backend = pick(None, ("data", "raster_backend"), "sorted")

    cfg = TrainConfig(
        data=DataConfig(dataset="packed", data_root=args.data_root,
                        height=args.height, width=args.width,
                        num_sweeps=args.sweeps,
                        height_extension=height_extension,
                        raster_backend=raster_backend),
        model=ModelConfig(arch=args.arch, decoder=args.decoder,
                          dtype=args.dtype,
                          filter_mode=args.filter_mode,
                          abs_threshold=args.abs_threshold,
                          rel_threshold=args.rel_threshold,
                          stage2_coarse=args.stage2_coarse),
        batch_size=args.batch,
    )
    pred = Predictor.from_run(args.run, cfg)
    spec = cfg.data.sample_spec()
    # Must mirror training-time rasterization: a run trained with radar
    # height extension evaluated without it sees different radar maps
    # (same silent-mismatch class as the filter-mode foot-gun above).
    pre = PreprocessConfig(spec=spec, height_extension=height_extension,
                           raster_backend=raster_backend)

    @jax.jit
    def infer_both(params, batch_stats, batch):
        prepared = prepare_eval_batch(batch, pre)
        inputs = pack_model_inputs(prepared, pred.arch_spec.input_kind)
        out = pred.model.apply(
            {"params": params, "batch_stats": batch_stats}, *inputs,
            train=False)
        coarse, refined = out[0], out[1]  # uncertainty variant appends log-vars
        radar = prepared["radar"]  # (B, H, W, 1) rasterized returns
        # Filter efficacy: replicate the model's keep-mask and classify each
        # radar pixel as corrupt (disagrees with GT where GT exists) vs clean.
        from radar_depth_tpu.models.fusion import filter_radar_by_prediction

        kept = filter_radar_by_prediction(
            radar, coarse, abs_threshold=args.abs_threshold,
            rel_threshold=args.rel_threshold, mode=args.filter_mode) > 0
        target = prepared["target"]
        has_gt = (radar > 0) & (target > 0)
        err = jnp.abs(radar - target)
        corrupt = has_gt & (err > 2.0) & (err / jnp.maximum(target, 1e-3) > 0.15)
        clean = has_gt & ~corrupt
        eff = {
            "radar_px": jnp.sum(radar > 0),
            "gt_px": jnp.sum(has_gt),
            "corrupt_px": jnp.sum(corrupt),
            "corrupt_kept": jnp.sum(corrupt & kept),
            "clean_px": jnp.sum(clean),
            "clean_kept": jnp.sum(clean & kept),
        }
        return coarse, refined, target, radar, eff

    ds = PackedDataset(os.path.join(args.data_root, "val"))
    from radar_depth_tpu.parallel.mesh import pad_batch_to

    def eval_split(split: str) -> tuple:
        """One split's full report. Returns (lines, ok); reuses the jitted
        infer_both across calls — shapes are identical, so multi-split runs
        compile exactly once."""
        if split and split != "all":
            # Restrict to one day/night split (tags sidecar). This is the
            # direct test of the paper's premise: radar should matter most
            # where the image is degraded, so coarse-vs-refined ON NIGHT
            # frames is the sharpest ablation row. Ragged tails are padded
            # by repeating the last sample with a zeroed target
            # (pad_batch_to), which the masked metrics skip; the
            # filter-efficacy counts skip padding too (has_gt needs
            # target > 0). `radar_px` alone counts padded returns —
            # cosmetic.
            indices = [i for i in range(len(ds))
                       if ds.sample_tag(i) == split]
            if not indices:
                return ([f"no samples tagged {split!r}"], False)
        else:
            indices = list(range(len(ds)))
        if not indices:
            # Same clear failure the tagged-split path gets — without this an
            # empty val dir leaves every sum as None and finalize crashes
            # with an opaque TypeError (ADVICE r4 low).
            return ([f"no samples in split {split or 'all'!r} "
                     f"(empty val set at {args.data_root})"], False)

        n = len(indices)
        sums = {"coarse": None, "refined": None,
                "coarse_radar_local": None, "refined_radar_local": None}

        def acc(key, s):
            sums[key] = s if sums[key] is None else jax.tree_util.tree_map(
                lambda a, b: a + b, sums[key], s)

        r = args.radius
        eff_tot = None
        for i0 in range(0, n, args.batch):
            chunk = indices[i0:i0 + args.batch]
            batch, _ = pad_batch_to(ds.batch(chunk), args.batch)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            coarse, refined, target, radar, eff = infer_both(
                pred.params, pred.batch_stats, batch)
            eff_tot = eff if eff_tot is None else jax.tree_util.tree_map(
                lambda a, b: a + b, eff_tot, eff)
            # radar-local mask: dilate the radar-return pixels by `radius`
            # (max-pool with a (2r+1)^2 window)
            occ = (radar > 0).astype(jnp.float32)
            local = jax.lax.reduce_window(
                occ, 0.0, jax.lax.max, (1, 2 * r + 1, 2 * r + 1, 1),
                (1, 1, 1, 1), "SAME") > 0
            t_local = jnp.where(local, target, 0.0)  # masked metrics skip 0s
            acc("coarse", compute_metric_sums(coarse, target, args.metric_avg))
            acc("refined",
                compute_metric_sums(refined, target, args.metric_avg))
            acc("coarse_radar_local",
                compute_metric_sums(coarse, t_local, args.metric_avg))
            acc("refined_radar_local",
                compute_metric_sums(refined, t_local, args.metric_avg))

        out = {k: finalize_metrics(jax.tree_util.tree_map(np.asarray, v))
               for k, v in sums.items()}
        lines = [f"run={args.run} filter={args.filter_mode} "
                 f"(abs={args.abs_threshold}, rel={args.rel_threshold}) "
                 f"val n={n}" + (f" split={split}" if split else "")]
        keys = ["rmse", "mae", "absrel", "delta1"]
        lines.append(f"{'output':24s} " + " ".join(f"{k:>8s}" for k in keys))
        for name in ("coarse", "refined", "coarse_radar_local",
                     "refined_radar_local"):
            row = out[name]
            lines.append(f"{name:24s} "
                         + " ".join(f"{row[k]:8.4f}" for k in keys))
        e = {k: int(v) for k, v in jax.tree_util.tree_map(np.asarray,
                                                          eff_tot).items()}
        drop_c = 1 - e["corrupt_kept"] / max(e["corrupt_px"], 1)
        drop_k = 1 - e["clean_kept"] / max(e["clean_px"], 1)
        lines.append(
            f"filter efficacy (GT-checkable radar px {e['gt_px']} of "
            f"{e['radar_px']}): corrupt {e['corrupt_px']} px, "
            f"{drop_c:.1%} dropped; clean {e['clean_px']} px, "
            f"{drop_k:.1%} dropped (false positives)")
        out["filter_efficacy"] = e
        lines.append(json.dumps({k: ({m: round(float(v[m]), 5) for m in keys}
                                     if k != "filter_efficacy" else v)
                                 for k, v in out.items()}))
        return (lines, True)

    splits = ([s.strip() for s in args.split.split(",") if s.strip()]
              if args.split else [""])
    ok = True
    for split in splits:
        lines, good = eval_split(split)
        ok = ok and good
        text = "\n".join(lines) + "\n"
        sys.stdout.write(text)
        sys.stdout.flush()
        if args.out_prefix and good:
            tag = split or "all"
            path = f"{args.out_prefix}{tag}.txt"
            with open(path, "w") as f:
                f.write(text)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
