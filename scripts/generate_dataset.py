"""Offline dataset generation → packed shards (the reference's L1 stage,
upstream:scripts/* nuScenes→pickle generation; SURVEY.md §3.3).

With no real nuScenes reachable in this environment, the generator writes the
synthetic fixture dataset into the packed binary format consumed by the native
loader (data/packed.py). When a real nuScenes export becomes available, its
per-sample arrays need only be adapted to the schema in data/schema.py and
written through the same write_shard().

Usage:
  python scripts/generate_dataset.py --out data/nuscenes-synth \
      --num-train 512 --num-val 128 --height 450 --width 800 --sweeps 5
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radar_depth_tpu.data.packed import write_shards  # noqa: E402
from radar_depth_tpu.data.schema import SampleSpec  # noqa: E402
from radar_depth_tpu.data.synthetic import SyntheticNuScenes  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--num-train", type=int, default=512)
    p.add_argument("--num-val", type=int, default=128)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--sweeps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-shard-bytes", type=int, default=4 << 30,
                   help="roll to a new shard file at this size (streaming "
                        "writes, bounded memory; VERDICT r2 #3)")
    p.add_argument("--night-severity", type=float, default=0.0,
                   help="0..1: information-destroying night rendering "
                        "(shadow crush, motion blur, heavy noise) — the "
                        "condition under which radar refinement should pay "
                        "(NOTES.md night-split row); 0 = the mild r3 model")
    p.add_argument("--night-frac", type=float, default=None,
                   help="fraction of night scenes (default: SceneConfig's "
                        "0.25); applies to both splits unless overridden")
    p.add_argument("--val-night-frac", type=float, default=None,
                   help="override night fraction for the VAL split only — "
                        "lets ablations keep the r3 train distribution "
                        "(0.25) while powering the night split (VERDICT r3 "
                        "#2 asks n_night >= 64, i.e. num-val 128 at 0.5)")
    args = p.parse_args()

    from radar_depth_tpu.data.synthetic import SceneConfig

    def make_scene(split: str) -> SceneConfig:
        kw = {"night_severity": args.night_severity}
        nf = args.night_frac
        if split == "val" and args.val_night_frac is not None:
            nf = args.val_night_frac
        if nf is not None:
            kw["night_frac"] = nf
        return SceneConfig(**kw)

    spec = SampleSpec(height=args.height, width=args.width,
                      num_sweeps=args.sweeps)
    for split, n, seed in (("train", args.num_train, args.seed),
                           ("val", args.num_val, args.seed + 1)):
        ds = SyntheticNuScenes(n, spec=spec, seed=seed, scene=make_scene(split))
        out_dir = os.path.join(args.out, split)
        t0 = time.time()
        paths = write_shards(out_dir, (ds[i] for i in range(n)),
                             tags=(ds.sample_tag(i) for i in range(n)),
                             max_shard_bytes=args.max_shard_bytes)
        size_mb = sum(os.path.getsize(q) for q in paths) / 1e6
        print(f"{split}: {n} samples → {out_dir} ({len(paths)} shard(s), "
              f"{size_mb:.0f} MB, {time.time() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
