"""HTTP serving daemon around :class:`radar_depth_tpu.inference.Predictor`.

The reference's only "serving" surface is `--evaluate` over a dataset
(upstream:main.py, SURVEY.md §3.2); this is the deployment-shaped superset:
a single-process daemon that loads a run dir (or StableHLO artifact weights
via Predictor) once and answers depth requests over HTTP.

    python -m radar_depth_tpu.serve --run runs/ms --port 8712

Wire format (stdlib-only on both ends):
  POST /predict   body = npz (numpy savez) of schema batch arrays
                  (data/schema.py SAMPLE_KEYS, leading batch dim)
                  → 200, body = npz {"depth": (B, H, W) float32 meters}
  GET  /healthz   → 200 "ok" once the model is loaded and warmed

Requests are tiled to power-of-two device batches internally
(Predictor.predict), so arbitrary request sizes neither recompile per size
nor hit the non-pow2 batch-padding cliff (NOTES.md). The device dispatch is
serialized with a lock — JAX dispatch is async and the server threads only
block on the final fetch, so pipelining comes from overlapping request
decode/encode with device compute.

Concurrent-load path (VERDICT r3 #8): with ``--batch-window-ms W`` > 0, a
dispatcher thread coalesces requests that arrive within a W-ms window (and
share array shapes) into ONE device batch of up to max_tile samples, then
splits the depth maps back per request. Single-flight per-request cost is
dominated by fixed per-dispatch overhead at small request sizes, so
coalescing N concurrent 1-sample requests costs ~one 8-sample dispatch
instead of 8 serialized ones (measured: scripts/bench_serve_concurrency.py,
table in NOTES.md). W=0 (default) keeps the plain serialized behavior.

Client example:

    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, **batch)
    req = urllib.request.Request("http://host:8712/predict",
                                 data=buf.getvalue(), method="POST")
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    depth = out["depth"]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Pending:
    """One enqueued request awaiting the coalescing dispatcher."""

    __slots__ = ("batch", "n", "key", "event", "result", "error")

    def __init__(self, batch, key):
        self.batch = batch
        self.n = next(iter(batch.values())).shape[0]
        self.key = key  # shape signature — only like requests coalesce
        self.event = threading.Event()
        self.result = None
        self.error = None


class DepthServer:
    """Owns the Predictor and the device lock; builds the HTTP server."""

    def __init__(self, predictor, max_tile: int = 128,
                 batch_window_ms: float = 0.0):
        self.predictor = predictor
        self.max_tile = max_tile
        self.batch_window_ms = batch_window_ms
        self._lock = threading.Lock()
        self.ready = False
        self._queue: list = []
        self._qcv = threading.Condition()
        self._stop = False
        self.dispatch_count = 0  # device dispatches (observability + tests)
        self._dispatcher = None
        if batch_window_ms > 0:
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True)
            self._dispatcher.start()

    def warmup(self) -> None:
        """Compile the serving program at EVERY power-of-two tile size up
        to max_tile before marking ready. The tiling dispatcher
        (inference.py::Predictor.predict) compiles one program per pow2
        tile on first use; warming only one size lets the first traffic
        burst hit the remaining tiles cold — measured r5 on the TPU relay
        (~30-60 s/compile), a coalescing server's first 64 requests paid
        3 in-band compiles and p99 blew up to 51 s. Warming the full tile
        ladder moves that cost to startup, where it belongs."""
        from radar_depth_tpu.data.synthetic import SyntheticNuScenes

        spec = self.predictor.cfg.data.sample_spec()
        ds = SyntheticNuScenes(self.max_tile, spec=spec, seed=0)
        with self._lock:
            n = 1
            while n <= self.max_tile:
                batch = ds.batch(range(min(n, self.max_tile)))
                self.predictor.predict(batch, max_tile=self.max_tile)
                n *= 2
        self.ready = True

    def predict_npz(self, body: bytes) -> bytes:
        batch = {k: v for k, v in np.load(io.BytesIO(body)).items()}
        if self.batch_window_ms > 0:
            depth = self._predict_coalesced(batch)
        else:
            with self._lock:
                self.dispatch_count += 1
                depth = self.predictor.predict(batch, max_tile=self.max_tile)
        out = io.BytesIO()
        np.savez(out, depth=np.asarray(depth, np.float32))
        return out.getvalue()

    # ---- cross-request micro-batching (--batch-window-ms) ----

    def _predict_coalesced(self, batch) -> np.ndarray:
        key = tuple(sorted((k, v.shape[1:], str(v.dtype))
                           for k, v in batch.items()))
        p = _Pending(batch, key)
        with self._qcv:
            if self._stop:
                raise RuntimeError("server closed")
            self._queue.append(p)
            self._qcv.notify()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def _dispatch_loop(self):
        import time

        while True:
            with self._qcv:
                while not self._queue and not self._stop:
                    self._qcv.wait()
                if self._stop:
                    # fail pending requests loudly instead of abandoning
                    # their waiters in event.wait() forever
                    for p in self._queue:
                        p.error = RuntimeError("server closed")
                        p.event.set()
                    self._queue = []
                    return
            # window: let concurrent requests land before dispatching
            time.sleep(self.batch_window_ms / 1000.0)
            with self._qcv:
                if not self._queue:
                    continue
                # Coalesce the oldest request's shape group, up to max_tile.
                # The HEAD request always dispatches — even when n > max_tile
                # (predictor.predict tiles oversized batches internally, same
                # as single-flight) — otherwise it would sit at the queue head
                # forever and starve everything behind it.
                key = self._queue[0].key
                group = [self._queue[0]]
                total = group[0].n
                rest = []
                for p in self._queue[1:]:
                    if p.key == key and total + p.n <= self.max_tile:
                        group.append(p)
                        total += p.n
                    else:
                        rest.append(p)
                self._queue = rest
            try:
                if len(group) == 1:
                    merged = group[0].batch
                else:
                    keys = group[0].batch.keys()
                    merged = {k: np.concatenate(
                        [np.asarray(p.batch[k]) for p in group])
                        for k in keys}
                with self._lock:
                    self.dispatch_count += 1
                    depth = np.asarray(self.predictor.predict(
                        merged, max_tile=self.max_tile))
                ofs = 0
                for p in group:
                    p.result = depth[ofs:ofs + p.n]
                    ofs += p.n
            except Exception as e:  # noqa: BLE001 — delivered per request
                for p in group:
                    p.error = e
            finally:
                for p in group:
                    p.event.set()

    def close(self):
        with self._qcv:
            self._stop = True
            self._qcv.notify_all()
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=5)
        with self._qcv:  # anything that slipped in after the drain
            for p in self._queue:
                p.error = RuntimeError("server closed")
                p.event.set()
            self._queue = []

    def handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet; stdout is the log
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/octet-stream"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    if server.ready:
                        self._send(200, b"ok", "text/plain")
                    else:
                        self._send(503, b"warming up", "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path != "/predict":
                    self._send(404, b"not found", "text/plain")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(n)
                    self._send(200, server.predict_npz(body))
                except Exception as e:  # surface the error to the client
                    msg = json.dumps({"error": f"{type(e).__name__}: {e}"})
                    self._send(400, msg.encode(), "application/json")

        return Handler

    def serve(self, host: str, port: int) -> ThreadingHTTPServer:
        httpd = ThreadingHTTPServer((host, port), self.handler())
        return httpd


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--run", required=True, help="training run dir "
                   "(self-describing config.json; best checkpoint)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8712)
    p.add_argument("--max-tile", type=int, default=128,
                   help="device batch tile (pow2; see NOTES.md batch cliff)")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="coalesce concurrent requests arriving within this "
                        "window into one device batch (0 = serialized "
                        "single-flight; VERDICT r3 #8)")
    p.add_argument("--spatial", type=int, default=1,
                   help="serve over a (data, space) mesh — image height "
                        "sharded over this many devices (ultra-high-res)")
    args = p.parse_args(argv)

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from radar_depth_tpu.inference import Predictor

    overrides = {"spatial": args.spatial} if args.spatial > 1 else {}
    predictor = Predictor.from_run(args.run, **overrides)
    srv = DepthServer(predictor, max_tile=args.max_tile,
                      batch_window_ms=args.batch_window_ms)
    print(f"serving {args.run} on http://{args.host}:{args.port} "
          f"(arch={predictor.cfg.model.arch}, "
          f"{predictor.cfg.data.height}x{predictor.cfg.data.width}, "
          f"max_tile={args.max_tile}); warming up...")
    srv.warmup()
    print("ready")
    httpd = srv.serve(args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
