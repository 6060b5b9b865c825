"""Export a trained checkpoint to a torch state_dict .pth file loadable by
the oracle models (radar_depth_tpu/oracle/torch_model.py) — the reverse of
--pretrained, completing torch interop (SURVEY.md §5 checkpoint notes).

Usage: python scripts/export_torch.py --run runs/exp1 --arch resnet18_latefusion \
           --decoder upproj --height 450 --width 800 --out exp1_torch.pth
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
    p.add_argument("--arch", default="resnet18_latefusion")
    p.add_argument("--modality", default="rgbd")
    p.add_argument("--decoder", default="upproj")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    args = p.parse_args()

    import jax

    # Conversion is pure host work — avoid minutes of TPU remote compilation
    # for the throwaway init. (The axon sitecustomize forces jax_platforms;
    # override via config, not env.)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import numpy as np
    import torch

    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.utils.torch_convert import variables_to_torch_state_dict

    cfg = TrainConfig(
        data=DataConfig(height=args.height, width=args.width),
        model=ModelConfig(arch=args.arch, modality=args.modality,
                          decoder=args.decoder),
    )
    pred = Predictor.from_run(args.run, cfg=cfg)
    sd = variables_to_torch_state_dict(
        {"params": pred.params, "batch_stats": pred.batch_stats})
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"exported {len(sd)} tensors → {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
