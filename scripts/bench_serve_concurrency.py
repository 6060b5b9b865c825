"""Concurrent-load benchmark for the HTTP serving daemon (VERDICT r3 #8).

Measures requests/s and latency under N concurrent clients, single-flight
(--batch-window-ms 0, the r3 behavior: one device dispatch per request,
serialized on the lock) vs coalesced (window > 0: concurrent requests ride
one device batch). Weights are random-init — serving throughput does not
depend on weight values, only on the compiled program.

Usage:
  python scripts/bench_serve_concurrency.py [--platform cpu] \
      [--height 96 --width 160 --sweeps 3] [--clients 8] [--requests 64]

Prints one JSON line per mode:
  {"mode": "single-flight"|"coalesced", "clients": N, "req_per_s": X,
   "p50_ms": X, "p99_ms": X, "device_dispatches": K}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="default", choices=["default", "cpu"])
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--sweeps", type=int, default=3)
    p.add_argument("--arch", default="resnet18_latefusion")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=64,
                   help="total requests per mode (1 sample each)")
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--max-tile", type=int, default=8)
    args = p.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from radar_depth_tpu.config import (
        AugmentConfig, DataConfig, ModelConfig, OptimConfig, TrainConfig)
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.serve import DepthServer
    from radar_depth_tpu.train.step import init_model
    import jax.random as jrandom

    cfg = TrainConfig(
        data=DataConfig(height=args.height, width=args.width,
                        num_sweeps=args.sweeps),
        model=ModelConfig(arch=args.arch),
        optim=OptimConfig(), augment=AugmentConfig(),
        batch_size=args.max_tile, epochs=1, output_dir="/tmp/unused")
    predictor = Predictor.__new__(Predictor)
    # random-init weights through the same path from_run uses
    from radar_depth_tpu.models import create_model

    model, arch_spec = create_model(
        cfg.model.arch, modality=cfg.model.modality,
        decoder=cfg.model.decoder,
        output_size=(cfg.data.height, cfg.data.width))
    variables = init_model(model, arch_spec, cfg, jrandom.PRNGKey(0))
    predictor.__init__(cfg, variables["params"], variables["batch_stats"])

    spec = cfg.data.sample_spec()
    ds = SyntheticNuScenes(max(args.clients, 8), spec=spec, seed=3)
    bodies = []
    for i in range(args.clients):
        buf = io.BytesIO()
        np.savez(buf, **ds.batch([i % len(ds)]))
        bodies.append(buf.getvalue())

    def run_mode(window_ms: float, label: str):
        srv = DepthServer(predictor, max_tile=args.max_tile,
                          batch_window_ms=window_ms)
        srv.warmup()
        httpd = srv.serve("127.0.0.1", 0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        lat: list = []
        lat_lock = threading.Lock()
        # ceil so no requested work is silently dropped (and per_client >= 1
        # even when requests < clients — an empty lat list would crash the
        # percentile computation after the servers were already spun up)
        per_client = max(1, -(-args.requests // args.clients))

        def client(ci):
            req_body = bodies[ci]
            for _ in range(per_client):
                t0 = time.perf_counter()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/predict", data=req_body,
                    method="POST")
                with urllib.request.urlopen(req) as r:
                    np.load(io.BytesIO(r.read()))["depth"]
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        httpd.shutdown()
        httpd.server_close()
        srv.close()
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        print(json.dumps({
            "mode": label, "clients": args.clients,
            "requests": len(lat),
            "req_per_s": round(len(lat) / wall, 2),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "device_dispatches": srv.dispatch_count,
        }))

    run_mode(0.0, "single-flight")
    run_mode(args.window_ms, "coalesced")
    return 0


if __name__ == "__main__":
    sys.exit(main())
