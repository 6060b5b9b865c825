"""Multi-host data path: REAL 2-process `jax.distributed` runs (CPU backend,
4 fake devices per process = one 8-device global mesh) in which each process
feeds only its PROCESS-LOCAL batch through
`shard_batch(process_local=True)` (jax.make_array_from_process_local_data)
and executes a jitted global computation with cross-process collectives
(Gloo) — the pod feeding pattern the single-host v5e-8 path generalizes to
(SURVEY.md §2 mesh-abstraction note; VERDICT r2 missing #4).

Two tiers:

* `test_two_process_data_path` (always on): global-sum over the assembled
  global batch — compiles in seconds, so both processes reach the Gloo
  rendezvous (30 s init window) even on a single-core host.
* `test_two_process_train_step` (auto-selects on hosts with >= 2 cores;
  force on a 1-core host with RDT_MULTIHOST_HEAVY=1): the FULL train
  step across processes. On a 1-core host the two cold compiles of the
  train step interleave for minutes and the persistent compile cache only
  matches process 0's key (cache keys include the process's device
  assignment), so process skew blows the 30 s Gloo window — run this on a
  multi-core host.
"""

import os
import socket
import subprocess
import sys

import pytest

PREAMBLE = r'''
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
from radar_depth_tpu.parallel.mesh import make_mesh, shard_batch
mesh = make_mesh()  # all 8 devices across both processes
'''

EXIT = r'''
sys.stdout.flush()
# Explicit shutdown + hard exit: letting atexit drive the coordination
# shutdown barrier intermittently times out on teardown skew AFTER the
# computation succeeded; the OK line above is the source of truth.
try:
    jax.distributed.shutdown()
except Exception:
    pass
os._exit(0)
'''

DATA_PATH = PREAMBLE + r'''
from radar_depth_tpu.data.schema import SampleSpec
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
spec = SampleSpec(height=32, width=48, num_sweeps=2)
ds = SyntheticNuScenes(8, spec=spec, seed=0)
# Each process loads a DIFFERENT local half of the global batch — no host
# ever holds the global batch (the pod feeding pattern).
local = ds.batch(range(pid * 4, pid * 4 + 4))
gbatch = shard_batch(local, mesh, process_local=True)
assert gbatch["image"].shape[0] == 8  # global leading axis
got = float(jax.jit(
    lambda b: jnp.sum(b["image"].astype(jnp.float32))
    + jnp.sum(b["lidar_depth"]))(gbatch))
# oracle: the global batch both halves assemble into
full = ds.batch(range(8))
want = float(np.sum(full["image"].astype(np.float64))
             + np.sum(full["lidar_depth"].astype(np.float64)))
assert abs(got - want) / want < 1e-5, (got, want)
print(f"MULTIHOST_OK pid={pid} sum={got:.6f}")
''' + EXIT

TRAIN_STEP = PREAMBLE + r'''
from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig
from radar_depth_tpu.data.synthetic import SyntheticNuScenes
from radar_depth_tpu.models import create_model
from radar_depth_tpu.train.state import create_train_state, make_optimizer
from radar_depth_tpu.train.step import init_model, make_train_step

H, W, S = 32, 48, 2
cfg = TrainConfig(
    data=DataConfig(height=H, width=W, num_sweeps=S),
    model=ModelConfig(arch="resnet18"),
    batch_size=8,
)
spec = cfg.data.sample_spec()
model, arch_spec = create_model(cfg.model.arch, output_size=(H, W))
variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
tx = make_optimizer(cfg.optim, steps_per_epoch=10)
state = create_train_state(variables, tx)
step_fn = make_train_step(model, arch_spec, cfg, tx)

ds = SyntheticNuScenes(8, spec=spec, seed=0)
local = ds.batch(range(pid * 4, pid * 4 + 4))
gbatch = shard_batch(local, mesh, process_local=True)
state, sums = step_fn(state, gbatch, jax.random.PRNGKey(1))
loss = float(sums["loss"])
assert np.isfinite(loss)
print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}")
''' + EXIT


def _run_pair(src: str, timeout: int):
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", src, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={i}" in out, out[-3000:]
    return outs


@pytest.mark.slow
def test_two_process_data_path():
    outs = _run_pair(DATA_PATH, timeout=300)
    # both processes computed the SAME global reduction (one global batch)
    vals = {out.split("sum=")[1].split()[0] for out in outs}
    assert len(vals) == 1, f"processes disagree on the global sum: {vals}"


@pytest.mark.slow
@pytest.mark.skipif(
    (os.cpu_count() or 1) < 2 and os.environ.get("RDT_MULTIHOST_HEAVY") != "1",
    reason=f"full cross-process train step: two cold train-step compiles on "
           f"this {os.cpu_count()}-core host skew past Gloo's 30s rendezvous "
           f"(force with RDT_MULTIHOST_HEAVY=1)")
def test_two_process_train_step():
    outs = _run_pair(TRAIN_STEP, timeout=900)
    losses = {out.split("loss=")[1].split()[0] for out in outs}
    assert len(losses) == 1, f"processes disagree on the global loss: {losses}"
