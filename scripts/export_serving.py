"""Export a trained run to a StableHLO serving artifact (weights + the full
raw-batch → depth preprocessing/forward graph baked in; loadable via
radar_depth_tpu.inference.load_serving with no Python model code).

Usage:
  python scripts/export_serving.py --run runs/ms --arch resnet18_multistage \
      --height 450 --width 800 --batch 8 --out ms_serving.stablehlo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--arch", default="resnet18_multistage")
    p.add_argument("--modality", default="rgbd")
    p.add_argument("--decoder", default="upproj")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--num-sweeps", type=int, default=5)
    p.add_argument("--height-extension", type=int, default=0)
    p.add_argument("--raster-backend", default="sorted",
                   choices=["sorted", "scatter"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    # multistage stage-2 filter — MUST match training (inference.py mirrors
    # Trainer for the same reason; a default-filtered export would silently
    # serve different depth maps than the trained model's eval)
    p.add_argument("--filter-mode", default="abs", choices=["abs", "rel", "or"])
    p.add_argument("--abs-threshold", type=float, default=2.0)
    p.add_argument("--rel-threshold", type=float, default=0.15)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cpu", action="store_true",
                   help="lower for CPU (default: the session's backend)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
    from radar_depth_tpu.inference import Predictor

    cfg = TrainConfig(
        data=DataConfig(height=args.height, width=args.width,
                        num_sweeps=args.num_sweeps,
                        height_extension=args.height_extension,
                        raster_backend=args.raster_backend),
        model=ModelConfig(arch=args.arch, modality=args.modality,
                          decoder=args.decoder, dtype=args.dtype,
                          filter_mode=args.filter_mode,
                          abs_threshold=args.abs_threshold,
                          rel_threshold=args.rel_threshold),
    )
    pred = Predictor.from_run(args.run, cfg=cfg)
    nbytes = pred.export_serving(args.out, args.batch)
    print(f"exported {nbytes / 1e6:.1f} MB → {args.out} "
          f"(batch={args.batch}, {args.height}x{args.width})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
