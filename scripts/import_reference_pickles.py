"""Ingestion bridge: reference-format per-sample pickles → packed shards.

The reference's offline stage (upstream:scripts/* nuScenes→pickle generation;
SURVEY.md §3.3) writes one pickle per sample holding roughly
{image, lidar depth map, radar points and/or rasterized radar map, K, pose
meta} — exact key names are [M]-grade until /root/reference is readable, so
this importer is deliberately tolerant: each logical field is looked up under
a list of candidate keys (extend via --key-map), and both radar
representations are accepted (a rasterized map falls back to map→points
extraction, the inverse of our on-device rasterizer).

Schema deltas handled here (see data/schema.py for the contract):
  * full-resolution (900×1600) inputs are downsampled to the model working
    resolution: images by 2×2 area average, sparse depth maps by 2×2 valid-min
    (preserving the z-buffer min-depth semantics of rasterization),
    intrinsics scaled accordingly;
  * LiDAR points, which reference pickles don't carry, are recovered from the
    GT depth map by pinhole unprojection (exact inverse of rasterization) so
    geometry-aware augmentation can re-rasterize GT under warps;
  * radar points land in sweep-0 buffers with identity cam←sensor transforms
    when the pickle stores already-projected/camera-frame data; a map-only
    pickle yields (u, v, z) unprojected the same way.

Usage:
  python scripts/import_reference_pickles.py --src /path/to/pickles \
      --out data/nuscenes-real --val-fraction 0.15
  # or with explicit split lists:
  python scripts/import_reference_pickles.py --src DIR --out OUT \
      --train-list train.txt --val-list val.txt

Round-trip tested in tests/test_import_pickles.py with fabricated
reference-format pickles.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radar_depth_tpu.data import schema  # noqa: E402
from radar_depth_tpu.data.packed import write_shards  # noqa: E402

# Candidate key names per logical field, most-likely first ([M] until the
# reference mount is readable; SURVEY.md §1 L1→L2 interface).
KEY_CANDIDATES = {
    "image": ["image", "img", "rgb", "im"],
    "lidar_depth": ["lidar_depth", "depth", "depth_gt", "gt", "gt_depth",
                    "lidar_map", "annotated_depth"],
    "radar_points": ["radar_points", "radar_pc", "points_radar"],
    "radar_map": ["radar_map", "radar_depth", "radar", "sparse_depth", "d",
                  "radar_raw"],
    "intrinsics": ["K", "intrinsics", "cam_K", "camera_matrix", "cam_intrinsic"],
}


def _lookup(d: dict, field: str, extra: dict):
    for k in [extra.get(field)] + KEY_CANDIDATES[field]:
        if k and k in d:
            return d[k]
    return None


def _to_hwc_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (3, 4) and img.shape[0] < img.shape[-1]:
        img = np.transpose(img, (1, 2, 0))  # CHW (torch) → HWC
    img = img[..., :3]
    if img.dtype != np.uint8:
        scale = 255.0 if img.max() <= 1.5 else 1.0
        img = np.clip(img * scale, 0, 255).astype(np.uint8)
    return img


def _area_downsample(img: np.ndarray, f: int) -> np.ndarray:
    h, w = img.shape[:2]
    img = img[: h - h % f, : w - w % f]
    hh, ww = img.shape[0] // f, img.shape[1] // f
    return img.reshape(hh, f, ww, f, -1).mean(axis=(1, 3)).astype(np.uint8)


def _min_downsample(depth: np.ndarray, f: int) -> np.ndarray:
    """Sparse-depth downsample preserving min-z rasterization semantics:
    per f×f block, the minimum over valid (>0) pixels, 0 if none."""
    h, w = depth.shape
    depth = depth[: h - h % f, : w - w % f]
    hh, ww = depth.shape[0] // f, depth.shape[1] // f
    blocks = depth.reshape(hh, f, ww, f).transpose(0, 2, 1, 3).reshape(hh, ww, -1)
    masked = np.where(blocks > 0, blocks, np.inf)
    out = masked.min(axis=-1)
    return np.where(np.isfinite(out), out, 0.0).astype(np.float32)


def _unproject(depth_map: np.ndarray, K: np.ndarray, max_points: int):
    """Sparse map → cam-frame points (exact inverse of z-buffer projection)."""
    v, u = np.nonzero(depth_map > 0)
    z = depth_map[v, u].astype(np.float32)
    if len(z) > max_points:
        # keep nearest returns (they dominate metrics); log drops upstream
        keep = np.argsort(z)[:max_points]
        u, v, z = u[keep], v[keep], z[keep]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u.astype(np.float32) + 0.5 - cx) / fx * z
    y = (v.astype(np.float32) + 0.5 - cy) / fy * z
    pts = np.stack([x, y, z], axis=-1).astype(np.float32)
    return pts, len(z)


def convert_sample(raw: dict, spec: schema.SampleSpec, key_map: dict,
                   stats: dict) -> dict:
    img = _lookup(raw, "image", key_map)
    gt = _lookup(raw, "lidar_depth", key_map)
    K = _lookup(raw, "intrinsics", key_map)
    if img is None or gt is None or K is None:
        missing = [f for f, v in [("image", img), ("lidar_depth", gt),
                                  ("intrinsics", K)] if v is None]
        raise KeyError(f"pickle lacks required fields {missing}; keys present: "
                       f"{sorted(raw)[:20]} — pass --key-map field=name")
    img = _to_hwc_uint8(img)
    gt = np.asarray(gt, np.float32)
    if gt.ndim == 3:
        gt = gt[0] if gt.shape[0] == 1 else gt[..., 0]
    K = np.asarray(K, np.float32)[:3, :3]

    f = img.shape[0] // spec.height
    if f > 1 and img.shape[0] == f * spec.height:
        img = _area_downsample(img, f)
        gt = _min_downsample(gt, f)
        K = K.copy()
        K[:2] /= f
    if img.shape[:2] != (spec.height, spec.width):
        raise ValueError(f"image {img.shape[:2]} is not the working resolution "
                         f"{(spec.height, spec.width)} nor an integer multiple")

    # --- radar: points if present, else map→points fallback
    rpts = _lookup(raw, "radar_points", key_map)
    if rpts is not None:
        rpts = np.asarray(rpts, np.float32)
        if rpts.ndim == 2 and rpts.shape[0] in (3, 4, 5, 18) \
                and rpts.shape[0] < rpts.shape[1]:
            rpts = rpts.T  # devkit convention: (dims, N) → (N, dims)
        rpts = rpts[..., :3]
    else:
        rmap = _lookup(raw, "radar_map", key_map)
        if rmap is None:
            raise KeyError("pickle has neither radar points nor a radar map")
        rmap = np.asarray(rmap, np.float32)
        if rmap.ndim == 3:
            rmap = rmap[0] if rmap.shape[0] == 1 else rmap[..., 0]
        if rmap.shape[0] != spec.height and rmap.shape[0] % spec.height == 0:
            rmap = _min_downsample(rmap, rmap.shape[0] // spec.height)
        rpts, _ = _unproject(rmap, K, spec.radar_points_per_sweep)
        stats["map_fallback"] = stats.get("map_fallback", 0) + 1

    # All reference radar data is already ego-compensated + camera-frame by
    # generation time (SURVEY.md §3.3), so sweeps collapse into sweep 0 with
    # identity transforms; remaining sweep slots stay masked-invalid.
    radar_points = np.zeros((spec.num_sweeps, spec.radar_points_per_sweep, 3),
                            np.float32)
    radar_valid = np.zeros((spec.num_sweeps, spec.radar_points_per_sweep),
                           bool)
    padded, mask, dropped = schema.pad_points(rpts, spec.radar_points_per_sweep)
    radar_points[0], radar_valid[0] = padded, mask
    stats["radar_dropped"] = stats.get("radar_dropped", 0) + dropped
    radar_transform = np.tile(np.eye(4, dtype=np.float32),
                              (spec.num_sweeps, 1, 1))

    lidar_pts, n_lidar = _unproject(gt, K, spec.lidar_points)
    lpad, lmask, ldrop = schema.pad_points(lidar_pts, spec.lidar_points)
    stats["lidar_dropped"] = stats.get("lidar_dropped", 0) + ldrop

    sample = {
        "image": img,
        "lidar_depth": gt.astype(np.float32),
        "lidar_points": lpad,
        "lidar_valid": lmask,
        "radar_points": radar_points,
        "radar_valid": radar_valid,
        "radar_transform": radar_transform,
        "intrinsics": K.astype(np.float32),
    }
    schema.validate_sample(sample, spec)
    return sample


TAG_CANDIDATES = ["tag", "split_tag", "scene_description", "description",
                  "scene_desc", "meta"]


def _extract_tag(raw: dict):
    """Day/night split tag from pickle metadata (nuScenes scene descriptions
    mention 'night'; the paper reports the splits separately — SURVEY.md §6).
    Returns 'day'/'night', or None when the pickle carries no usable meta."""
    for k in TAG_CANDIDATES:
        v = raw.get(k)
        if isinstance(v, dict):
            v = v.get("description") or v.get("tag")
        if isinstance(v, str) and v:
            return "night" if "night" in v.lower() else "day"
    return None


def _list_pickles(src: str):
    out = []
    for root, _, files in os.walk(src):
        for f in sorted(files):
            if f.endswith((".pkl", ".pickle", ".p")):
                out.append(os.path.join(root, f))
    return sorted(out)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="directory of per-sample pickles")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=schema.MODEL_HEIGHT)
    p.add_argument("--width", type=int, default=schema.MODEL_WIDTH)
    p.add_argument("--sweeps", type=int, default=schema.DEFAULT_NUM_SWEEPS)
    p.add_argument("--val-fraction", type=float, default=0.15)
    p.add_argument("--train-list", default="", help="file of pickle paths")
    p.add_argument("--val-list", default="")
    p.add_argument("--max-shard-bytes", type=int, default=4 << 30,
                   help="roll packed output to a new shard file at this size "
                        "(streaming writes, bounded memory; VERDICT r2 #3)")
    p.add_argument("--key-map", nargs="*", default=[],
                   metavar="FIELD=PICKLE_KEY",
                   help="override key lookup, e.g. lidar_depth=depth_png")
    args = p.parse_args()

    key_map = dict(kv.split("=", 1) for kv in args.key_map)
    spec = schema.SampleSpec(height=args.height, width=args.width,
                             num_sweeps=args.sweeps)

    if args.train_list or args.val_list:
        def read_list(path):
            with open(path) as f:
                return [ln.strip() for ln in f if ln.strip()]
        splits = {"train": read_list(args.train_list) if args.train_list else [],
                  "val": read_list(args.val_list) if args.val_list else []}
    else:
        paths = _list_pickles(args.src)
        if not paths:
            print(f"no pickles under {args.src}", file=sys.stderr)
            return 1
        n_val = max(1, int(len(paths) * args.val_fraction))
        splits = {"train": paths[:-n_val], "val": paths[-n_val:]}

    for split, paths in splits.items():
        if not paths:
            continue
        stats: dict = {}

        # Day/night tags: decide from the first pickle whether the source
        # carries scene metadata; if yes, stream tags alongside samples into
        # the per-shard sidecars (--eval-splits then works on imported data).
        with open(paths[0], "rb") as f:
            has_tags = _extract_tag(pickle.load(f)) is not None

        def pairs():
            for path in paths:
                with open(path, "rb") as f:
                    raw = pickle.load(f)
                tag = _extract_tag(raw) or "day"
                yield convert_sample(raw, spec, key_map, stats), tag

        out_dir = os.path.join(args.out, split)
        import itertools

        s_it, t_it = itertools.tee(pairs())  # interleaved ⇒ O(1) buffering
        shards = write_shards(
            out_dir, (s for s, _ in s_it),
            tags=(t for _, t in t_it) if has_tags else None,
            max_shard_bytes=args.max_shard_bytes)
        size_mb = sum(os.path.getsize(q) for q in shards) / 1e6
        print(f"{split}: {len(paths)} pickles → {out_dir} "
              f"({len(shards)} shard(s), {size_mb:.0f} MB, "
              f"tags={'yes' if has_tags else 'no'}); "
              f"drops/fallbacks: {stats or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
