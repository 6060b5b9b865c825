"""Measure rasterization backends on the real device (VERDICT r1 #6 /
NOTES open item #2): XLA scatter-min vs sorted+unique-set scatter vs the r1
Pallas broadcast kernel vs the new sorted tile-partitioned Pallas kernel,
at radar density (P≈640) through LiDAR density (P≈40k).

Pipelined timing: the whole iteration loop runs on device via lax.scan with a
carry threaded into the inputs (relay dispatch ≈30 ms/synchronized call, so
per-call timing would measure the relay; see NOTES.md device facts).

Usage: python scripts/exp_raster_sorted.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--tile-rows", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from radar_depth_tpu.ops.pallas_kernels import (
        points_to_linear,
        rasterize_min_depth_pallas,
        rasterize_min_depth_pallas_sorted,
    )
    from radar_depth_tpu.ops.raster import (
        rasterize_min_depth,
        rasterize_min_depth_sorted_xla,
        sort_points_by_pixel,
    )

    h, w = args.height, args.width
    interpret = jax.default_backend() != "tpu"

    def make_variants(b, p_):
        def scatter(uv, z, valid):
            return rasterize_min_depth(uv, z, valid, h, w, 0.0, 80.0)

        def sorted_xla(uv, z, valid):
            return rasterize_min_depth_sorted_xla(uv, z, valid, h, w, 0.0, 80.0)

        def pallas_broadcast(uv, z, valid):
            lin, zf = points_to_linear(uv, z, valid, h, w, 0.0, 80.0)
            return rasterize_min_depth_pallas(lin, zf, h, w,
                                              interpret=interpret)

        def pallas_sorted(uv, z, valid):
            lin_s, z_s = sort_points_by_pixel(uv, z, valid, h, w, 0.0, 80.0)
            return rasterize_min_depth_pallas_sorted(
                lin_s, z_s, h, w, tile_rows=args.tile_rows,
                interpret=interpret)

        def sort_only(uv, z, valid):
            lin_s, z_s = sort_points_by_pixel(uv, z, valid, h, w, 0.0, 80.0)
            return (lin_s[..., :1] + z_s[..., :1]).reshape(b, 1, 1)

        out = [("scatter", scatter), ("sorted_xla", sorted_xla),
               ("pallas_sorted", pallas_sorted), ("sort_only", sort_only)]
        if p_ <= 4096:  # r1 broadcast kernel does P×HW work; hopeless at 40k
            out.append(("pallas_broadcast", pallas_broadcast))
        return out

    from scripts.bench_util import pipelined_timer

    def bench(fn, uv, z, valid):
        return pipelined_timer(fn, (uv, z, valid), iters=args.iters)

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} interpret={interpret} "
          f"HxW={h}x{w} iters={args.iters}")
    for b, p_ in [(32, 640), (32, 10240), (8, 40960), (32, 40960)]:
        uv = jnp.asarray(np.stack([
            rng.uniform(0, w, size=(b, p_)), rng.uniform(0, h, size=(b, p_))],
            axis=-1).astype(np.float32))
        z = jnp.asarray(rng.uniform(1, 79, size=(b, p_)).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(b, p_)) > 0.1)
        rows = []
        for name, fn in make_variants(b, p_):
            try:
                dt = bench(fn, uv, z, valid)
                rows.append(f"{name}={dt * 1e3:8.3f}ms")
            except Exception as e:  # pragma: no cover
                rows.append(f"{name}=FAIL({type(e).__name__})")
        print(f"B={b:3d} P={p_:6d}: " + "  ".join(rows), flush=True)


if __name__ == "__main__":
    main()
