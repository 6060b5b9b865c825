"""Full-scale real-data REHEARSAL (VERDICT r2 #5): exercise the exact chain
that real nuScenes will take on the day the mount appears —

  per-sample reference-format pickles (900×1600, incl. map-only radar
  variants and scene descriptions) → scripts/import_reference_pickles.py
  (streamed, bounded RSS) → multi-shard packed splits → short TPU training
  run → --evaluate --eval-splits (day/night)

— at realistic scale (default 2048 samples ≈ 21 GB of pickles), fabricated
because no real data exists on this machine (upstream:scripts/* pickle
schema; SURVEY.md §1 L1→L2, Step-0 protocol). Every stage runs UNMODIFIED
production code via subprocesses; the real mount is a drop-in for --src.

Usage:
  python scripts/rehearse_real_scale.py --root /tmp/rehearsal \
      [--num 2048] [--skip-fabricate] [--skip-train] [--keep-src]

Prints a PASS/FAIL summary incl. importer peak RSS (must stay < 2 GB
regardless of scale — the streamed multi-shard writer's contract).
"""

from __future__ import annotations

import argparse
import os
import pickle
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULL_H, FULL_W = 900, 1600  # nuScenes CAM_FRONT native resolution


def fabricate_sample(rng: np.random.Generator, night: bool,
                     radar_as_map: bool) -> dict:
    """One reference-format pickle dict at native resolution. Cheap but
    STRUCTURED: a ground plane + fronto-parallel boxes render consistently
    into image, sparse GT depth, and radar (with ghost/clutter outliers), so
    the rehearsal training run has real signal to fit."""
    H, W = FULL_H, FULL_W
    fx = 1266.42
    cx, cy = W / 2.0, H / 2.0
    cam_h = 1.5
    K = np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)

    # dense depth field: ground plane + boxes (far to near)
    vv = np.arange(H, dtype=np.float32) + 0.5
    with np.errstate(divide="ignore"):
        ground_z = np.where(vv > cy + 1, fx * cam_h / (vv - cy), np.inf)
    dense = np.broadcast_to(ground_z[:, None], (H, W)).copy()
    img = np.empty((H, W, 3), np.float32)
    img[:] = np.array([0.55, 0.65, 0.85])  # sky
    gmask = np.isfinite(dense)
    shade = np.clip(1.0 - dense / 120.0, 0.2, 1.0)
    for c, base in enumerate((0.35, 0.33, 0.30)):
        img[..., c] = np.where(gmask, base * shade, img[..., c])

    n_boxes = int(rng.integers(6, 14))
    order = np.sort(rng.uniform(5.0, 70.0, n_boxes))[::-1]  # far → near
    box_px = []
    for z in order:
        bw = rng.uniform(1.5, 6.0)
        bh = rng.uniform(1.0, 3.5)
        bx = rng.uniform(-20.0, 20.0)
        u0 = int(np.clip((bx - bw / 2) / z * fx + cx, 0, W))
        u1 = int(np.clip((bx + bw / 2) / z * fx + cx, 0, W))
        v1 = int(np.clip(cam_h / z * fx + cy, 0, H))          # ground contact
        v0 = int(np.clip((cam_h - bh) / z * fx + cy, 0, H))   # top
        if u1 <= u0 or v1 <= v0:
            continue
        albedo = rng.uniform(0.2, 0.9, 3)
        sh = np.clip(1.0 - z / 150.0, 0.3, 1.0)
        img[v0:v1, u0:u1] = albedo * sh
        dense[v0:v1, u0:u1] = z
        box_px.append((u0, u1, v0, v1, z))

    img += rng.normal(0, 0.015, img.shape)
    if night:
        img = img * 0.22 + rng.normal(0, 6.0 / 255.0, img.shape)
    img_u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)

    # sparse GT: LiDAR-density random subset of the dense field
    gt = np.zeros((H, W), np.float32)
    n_gt = 40000
    uu = rng.integers(0, W, n_gt)
    vg = rng.integers(int(cy * 0.7), H, n_gt)
    z = dense[vg, uu]
    ok = np.isfinite(z) & (z > 0.5) & (z < 80.0)
    gt[vg[ok], uu[ok]] = z[ok]

    # radar: returns on boxes + multipath ghosts + clutter (camera-frame,
    # already ego-compensated — the reference stores it that way)
    pts = []
    for (u0, u1, v0, v1, z) in box_px:
        k = int(rng.poisson(3))
        if k == 0:
            continue
        ur = rng.uniform(u0, u1, k)
        zr = z + rng.normal(0, 0.15, k)
        x = (ur + 0.5 - cx) / fx * zr
        y = rng.normal(cam_h - 0.5, 0.4, k)
        pts.append(np.stack([x, y, zr], -1))
        if rng.uniform() < 0.4:  # ghost at k× range, same bearing
            g = rng.uniform(1.5, 2.4)
            pts.append(np.stack([x * g, y, zr * g], -1))
    n_cl = 8
    pts.append(np.stack([rng.uniform(-25, 25, n_cl),
                         rng.normal(cam_h - 0.5, 0.8, n_cl),
                         rng.uniform(2.0, 70.0, n_cl)], -1))
    pc = np.concatenate(pts, 0).astype(np.float32)
    proj_ok = pc[:, 2] > 1.0
    pc = pc[proj_ok][:120]

    sample = {
        "im": img_u8,  # HWC uint8 (importer normalizes layouts)
        "depth": gt,
        "K": K,
        "scene_description": ("night drive, low light" if night
                              else "sunny day, clear"),
    }
    if radar_as_map:
        rmap = np.zeros((H, W), np.float32)
        u = np.clip(pc[:, 0] / pc[:, 2] * fx + cx, 0, W - 1).astype(int)
        v = np.clip(pc[:, 1] / pc[:, 2] * fx + cy, 0, H - 1).astype(int)
        rmap[v, u] = pc[:, 2]
        sample["sparse_depth"] = rmap
    else:
        sample["radar_pc"] = np.zeros((18, len(pc)), np.float32)
        sample["radar_pc"][0], sample["radar_pc"][1], sample["radar_pc"][2] = \
            pc[:, 0], pc[:, 1], pc[:, 2]
    return sample


def fabricate(src: str, num: int, seed: int, map_frac: float,
              night_frac: float) -> None:
    os.makedirs(src, exist_ok=True)
    t0 = time.time()
    for i in range(num):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        s = fabricate_sample(rng, night=rng.uniform() < night_frac,
                             radar_as_map=rng.uniform() < map_frac)
        with open(os.path.join(src, f"{i:06d}.pkl"), "wb") as f:
            pickle.dump(s, f, protocol=4)
        if (i + 1) % 256 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"  fabricated {i + 1}/{num} ({rate:.1f}/s)", flush=True)


def run_importer(src: str, out: str, max_shard_bytes: int) -> float:
    """Run the production importer in a child process; returns its peak RSS
    in GB (the bounded-memory contract)."""
    code = (
        "import resource, sys; sys.argv = ['imp', '--src', %r, '--out', %r, "
        "'--height', '450', '--width', '800', '--sweeps', '1', "
        "'--val-fraction', '0.125', '--max-shard-bytes', '%d']; "
        "sys.path.insert(0, 'scripts'); "
        "import import_reference_pickles as imp; rc = imp.main(); "
        "print('PEAK_RSS_KB', resource.getrusage(resource.RUSAGE_SELF)"
        ".ru_maxrss); sys.exit(rc)" % (src, out, max_shard_bytes)
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=7200)
    print(r.stdout[-2000:])
    if r.returncode != 0:
        print(r.stderr[-3000:])
        raise RuntimeError(f"importer failed rc={r.returncode}")
    rss_kb = int(r.stdout.split("PEAK_RSS_KB")[1].split()[0])
    return rss_kb / 1e6


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/rehearsal")
    p.add_argument("--num", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--map-frac", type=float, default=0.1,
                   help="fraction of map-only radar pickles")
    p.add_argument("--night-frac", type=float, default=0.25)
    p.add_argument("--max-shard-bytes", type=int, default=1 << 30,
                   help="1 GiB shards ⇒ the 2k-sample train split multi-shards")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--skip-fabricate", action="store_true")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--keep-src", action="store_true",
                   help="keep the fabricated pickles (default: delete after "
                        "a successful import to reclaim ~20 GB)")
    args = p.parse_args()

    src = os.path.join(args.root, "pickles")
    out = os.path.join(args.root, "packed")
    run = os.path.join(args.root, "run")

    if not args.skip_fabricate:
        print(f"[1/4] fabricating {args.num} reference-format pickles → {src}")
        fabricate(src, args.num, args.seed, args.map_frac, args.night_frac)
    size_gb = sum(os.path.getsize(os.path.join(src, f))
                  for f in os.listdir(src)) / 1e9
    print(f"      src size: {size_gb:.1f} GB, {len(os.listdir(src))} pickles")

    print("[2/4] importing (production importer, child process)")
    rss_gb = run_importer(src, out, args.max_shard_bytes)
    shards = sorted(os.listdir(os.path.join(out, "train")))
    n_shards = len([s for s in shards if s.endswith(".rdtp")])
    print(f"      importer peak RSS: {rss_gb:.2f} GB; train shards: {n_shards}")
    assert rss_gb < 2.0, f"importer RSS {rss_gb:.2f} GB breaks the <2 GB contract"
    assert n_shards >= 2, f"expected multi-shard train output, got {n_shards}"
    if not args.keep_src:
        shutil.rmtree(src)
        print("      fabricated pickles deleted (--keep-src to retain)")

    if args.skip_train:
        print("PASS (train skipped)")
        return 0

    print(f"[3/4] TPU training {args.epochs} epochs on the imported shards")
    train_cmd = [sys.executable, "-m", "radar_depth_tpu.train.main",
                 "--arch", "resnet18_latefusion", "-b", "32",
                 "--dtype", "bfloat16", "--epochs", str(args.epochs),
                 "--lr", "0.01", "--height", "450", "--width", "800",
                 "--num-sweeps", "1", "--dataset", "packed",
                 "--data-root", out, "--output-dir", run]
    r = subprocess.run(train_cmd, timeout=14400)
    assert r.returncode == 0, "training failed"

    print("[4/4] --evaluate --eval-splits on the run")
    r = subprocess.run(train_cmd + ["--evaluate", run, "--eval-splits"],
                       timeout=7200)
    assert r.returncode == 0, "evaluate failed"
    for f in ("train.csv", "test.csv", "best.txt"):
        assert os.path.exists(os.path.join(run, f)), f
    print("PASS: fabricate → import (multi-shard, bounded RSS) → train → "
          "eval-splits all green; point --src at the real mount to rerun")
    return 0


if __name__ == "__main__":
    sys.exit(main())
