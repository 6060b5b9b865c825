"""Driver-contract surfaces: bench.py must print one valid JSON line and
__graft_entry__ must compile-check on whatever devices exist (here: the
8-device CPU mesh from conftest)."""

import json
import sys

import jax
import numpy as np


def test_bench_main_prints_json(capsys, monkeypatch):
    import bench

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--batch", "8", "--iters", "2", "--warmup", "1",
        "--height", "64", "--width", "96", "--sweeps", "2",
        "--dtype", "float32",
    ])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["metric"] == "images_per_sec_per_chip"
    assert payload["unit"] == "img/s/chip"
    assert payload["value"] > 0
    assert abs(payload["vs_baseline"] - payload["value"] / 1000.0) < 1e-3


def test_graft_dryrun_multichip_two_devices():
    import __graft_entry__ as g

    assert jax.device_count() >= 2
    g.dryrun_multichip(2)
