"""Driver-contract surfaces: bench.py must print one valid JSON line and
__graft_entry__ must compile-check on whatever devices exist (here: the
8-device CPU mesh from conftest)."""

import json
import sys

import pytest

import jax


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


@pytest.mark.slow
def test_graft_dryrun_multichip_two_devices():
    import __graft_entry__ as g

    assert jax.device_count() >= 2
    g._dryrun_multichip_impl(2)


@pytest.mark.slow
def test_graft_dryrun_driver_convention():
    """Reproduce the driver's calling convention exactly: a fresh python
    process with NO JAX_PLATFORMS pin (so sitecustomize's axon default
    applies) calls dryrun_multichip(n). Round 1 failed this in the driver's
    environment because the axon backend was initialized and hit a libtpu
    client/terminal mismatch; dryrun_multichip must never touch it."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # The driver exports a forced host device count; make sure that form of
    # the environment is handled too.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    code = (
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(4)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(4): OK" in proc.stdout
