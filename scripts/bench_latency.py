"""Serving-latency benchmark: per-request latency distribution of the fused
raw-batch → preproc → two-stage forward graph (the Predictor serving surface,
inference.py), complementing bench.py's throughput numbers.

Two measurements per batch size:
  device   — input resident on device, one scalar forced per request:
             the model+preproc service time (production floor).
  e2e      — fresh host batch each request: upload + infer + full fetch
             (what a single-host serving loop without pipelining sees; on
             the axon relay this is dominated by the ~0.03 GB/s link —
             see NOTES.md "Device/runtime facts" — so e2e here measures
             the relay, not the framework; use predict_stream to overlap).

Prints one JSON line per batch size:
  {"batch": B, "device_ms": {p50, p90, p99, mean}, "e2e_ms": {...},
   "device_img_per_sec": N}

Not part of the driver contract (bench.py is the driver metric).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def pct(xs, q):
    return float(np.percentile(np.asarray(xs) * 1e3, q))


def dist(xs):
    return {"p50": round(pct(xs, 50), 2), "p90": round(pct(xs, 90), 2),
            "p99": round(pct(xs, 99), 2),
            "mean": round(float(np.mean(xs) * 1e3), 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32",
                   help="comma-separated batch sizes")
    p.add_argument("--requests", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--sweeps", type=int, default=5)
    p.add_argument("--arch", default="resnet18_multistage")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--run", default="",
                   help="optional run dir (Predictor.from_run); default "
                        "fresh-initialized weights (latency is "
                        "weight-independent)")
    args = p.parse_args()

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.train.step import init_model

    cfg = TrainConfig(
        data=DataConfig(height=args.height, width=args.width,
                        num_sweeps=args.sweeps),
        model=ModelConfig(arch=args.arch, dtype=args.dtype),
    )
    if args.run:
        pred = Predictor.from_run(args.run, cfg)
    else:
        from radar_depth_tpu.models import create_model

        model, arch_spec = create_model(
            args.arch, output_size=(args.height, args.width),
            dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype])
        variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
        pred = Predictor(cfg, variables["params"],
                         variables.get("batch_stats", {}))

    spec = cfg.data.sample_spec()
    for b in [int(x) for x in args.batches.split(",")]:
        ds = SyntheticNuScenes(b, spec=spec, seed=0)
        host = ds.batch(range(b))

        # device-resident service time: one tiny scalar forced per request
        dev = {k: jnp.asarray(v) for k, v in host.items()}
        for _ in range(args.warmup):
            out, _ = pred._infer(pred.params, pred.batch_stats, dev)
            float(out[0, 0, 0])
        lat_dev = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            out, _ = pred._infer(pred.params, pred.batch_stats, dev)
            float(out[0, 0, 0])  # scalar force (relay-safe sync)
            lat_dev.append(time.perf_counter() - t0)

        # e2e: fresh upload + full fetch per request (predict())
        for _ in range(args.warmup):
            pred.predict(host)
        lat_e2e = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            pred.predict(host)
            lat_e2e.append(time.perf_counter() - t0)

        med = np.median(lat_dev)
        print(json.dumps({
            "batch": b,
            "device_ms": dist(lat_dev),
            "e2e_ms": dist(lat_e2e),
            "device_img_per_sec": round(b / med, 1),
        }))


if __name__ == "__main__":
    main()
