"""HTTP serving daemon round-trip: train a tiny run, start the server
in-process, POST an npz batch, and compare against Predictor.predict."""

import io
import threading
import urllib.request

import numpy as np
import pytest

from radar_depth_tpu.config import (
    AugmentConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)

pytestmark = pytest.mark.slow


def test_serve_round_trip(tmp_path):
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.serve import DepthServer
    from radar_depth_tpu.train.loop import Trainer

    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(tmp_path), print_freq=100)
    Trainer(cfg).fit()

    predictor = Predictor.from_run(str(tmp_path))
    srv = DepthServer(predictor, max_tile=8)
    srv.warmup()
    httpd = srv.serve("127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health check
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200 and r.read() == b"ok"

        # npz round trip, non-pow2 request size (exercises tiling)
        batch = SyntheticNuScenes(3, spec=cfg.data.sample_spec(),
                                  seed=7).batch(range(3))
        buf = io.BytesIO()
        np.savez(buf, **batch)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            out = np.load(io.BytesIO(r.read()))
        depth = out["depth"]
        assert depth.shape == (3, 64, 96)
        np.testing.assert_allclose(depth, predictor.predict(batch),
                                   rtol=1e-6, atol=1e-6)

        # malformed request → structured 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an npz",
            method="POST")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"error" in e.read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200
    finally:
        httpd.shutdown()
        httpd.server_close()
