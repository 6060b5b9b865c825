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


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """One tiny trained run shared by the serving tests."""
    from radar_depth_tpu.train.loop import Trainer

    out = tmp_path_factory.mktemp("serve_run")
    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(out), print_freq=100)
    Trainer(cfg).fit()
    return cfg, str(out)


def test_serve_round_trip(tiny_run):
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.serve import DepthServer

    cfg, run_dir = tiny_run
    predictor = Predictor.from_run(run_dir)
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


def test_serve_coalesces_concurrent_requests(tiny_run):
    """--batch-window-ms: N concurrent single-sample requests ride ONE
    device dispatch (grouped by shape up to max_tile) and each client gets
    exactly its own depth map back (VERDICT r3 #8)."""
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.serve import DepthServer

    cfg, run_dir = tiny_run
    predictor = Predictor.from_run(run_dir)
    srv = DepthServer(predictor, max_tile=8, batch_window_ms=200.0)
    srv.warmup()
    httpd = srv.serve("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    ds = SyntheticNuScenes(6, spec=cfg.data.sample_spec(), seed=11)
    bodies = []
    for i in range(4):
        buf = io.BytesIO()
        np.savez(buf, **ds.batch([i]))
        bodies.append(buf.getvalue())

    results: dict = {}

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=bodies[i],
            method="POST")
        with urllib.request.urlopen(req) as r:
            results[i] = np.load(io.BytesIO(r.read()))["depth"]

    try:
        base = srv.dispatch_count
        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        # all four requests landed within the 200 ms window -> one dispatch
        # (allow 2 in case a straggler thread missed the first window)
        assert srv.dispatch_count - base <= 2, srv.dispatch_count - base
        # each client got ITS sample's prediction (not a neighbor's)
        expect = predictor.predict(ds.batch(range(4)), max_tile=8)
        for i in range(4):
            assert results[i].shape == (1, 64, 96)
            np.testing.assert_allclose(results[i][0], expect[i],
                                       rtol=1e-5, atol=1e-5)
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.close()


def test_serve_coalesced_oversized_request(tiny_run):
    """A request LARGER than max_tile must still dispatch in coalesced mode
    (predictor tiles it internally) — it must not wedge the queue head and
    starve every later request. Also: close() fails queued stragglers loudly
    instead of leaving their waiters blocked forever."""
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.inference import Predictor
    from radar_depth_tpu.serve import DepthServer

    cfg, run_dir = tiny_run
    predictor = Predictor.from_run(run_dir)
    srv = DepthServer(predictor, max_tile=4, batch_window_ms=50.0)
    srv.warmup()
    try:
        big = SyntheticNuScenes(6, spec=cfg.data.sample_spec(),
                                seed=13).batch(range(6))  # n=6 > max_tile=4
        buf = io.BytesIO()
        np.savez(buf, **big)
        done = {}

        def call():
            out = srv.predict_npz(buf.getvalue())
            done["depth"] = np.load(io.BytesIO(out))["depth"]

        t = threading.Thread(target=call)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "oversized request wedged the dispatcher"
        assert done["depth"].shape == (6, 64, 96)
        np.testing.assert_allclose(done["depth"], predictor.predict(big),
                                   rtol=1e-5, atol=1e-5)
    finally:
        srv.close()
    with pytest.raises(RuntimeError, match="server closed"):
        srv.predict_npz(buf.getvalue())
