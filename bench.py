"""End-to-end throughput benchmark (BASELINE.json north star: ≥1000
images/sec/chip, preproc + inference, on the flagship two-stage model).

Measures steady-state images/sec for the fused raw-batch → multi-sweep radar
preproc → two-stage late-fusion forward pipeline on the local device(s),
divides by chip count, and prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
   "vs_baseline": N/1000}
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--sweeps", type=int, default=5)
    p.add_argument("--arch", default="resnet18_multistage")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--mode", default="infer", choices=["infer", "train"],
                   help="infer: preproc+forward (the driver metric); train: "
                        "full step incl. augmentation, backward, SGD update")
    args = p.parse_args()

    from radar_depth_tpu.data.schema import SampleSpec
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.models import create_model
    from radar_depth_tpu.ops.preprocess import (
        PreprocessConfig,
        pack_model_inputs,
        prepare_eval_batch,
    )

    n_chips = jax.device_count()
    spec = SampleSpec(height=args.height, width=args.width,
                      num_sweeps=args.sweeps, max_depth=80.0)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    extra = {"remat": True} if (args.remat and "multistage" in args.arch) else {}
    model, arch_spec = create_model(
        args.arch, decoder="upproj", output_size=(spec.height, spec.width),
        dtype=dtype, **extra,
    )

    ds = SyntheticNuScenes(args.batch, spec=spec, seed=0)
    host_batch = ds.batch(range(args.batch))
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    from radar_depth_tpu.train.step import init_model
    from radar_depth_tpu.config import DataConfig, ModelConfig, TrainConfig

    cfg = TrainConfig(
        data=DataConfig(height=spec.height, width=spec.width,
                        num_sweeps=spec.num_sweeps),
        model=ModelConfig(arch=args.arch, dtype=args.dtype),
        batch_size=args.batch,
    )
    variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
    pre_cfg = PreprocessConfig(spec=spec)

    if args.mode == "train":
        return bench_train(args, model, arch_spec, cfg, variables, batch,
                           n_chips)

    def step(params, batch_stats, batch, carry):
        # Thread the carry into EVERY model input (±1e-30): a genuine data
        # dependence so XLA cannot hoist any part of the pipeline (preproc,
        # radar branch, image branch) out of the scan and "run" it once.
        # Matches streaming inference where each batch is new data.
        eps = carry * 1e-30
        batch = dict(batch,
                     radar_points=batch["radar_points"]
                     + eps.astype(batch["radar_points"].dtype))
        prepared = prepare_eval_batch(batch, pre_cfg)
        prepared = dict(prepared,
                        rgb=prepared["rgb"] + eps.astype(prepared["rgb"].dtype))
        inputs = pack_model_inputs(prepared, arch_spec.input_kind)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          *inputs, train=False)
        pred = out[1] if arch_spec.multistage else out
        # carry chain orders the stream on device; fetching the final carry
        # forces every iteration to have really executed. (This device sits
        # behind a relay with ~30 ms per *synchronized* dispatch and ~3 ms
        # per *pipelined* dispatch, so the bench runs the whole iteration
        # loop ON DEVICE via lax.scan — one dispatch total — and fetches one
        # scalar. This matches steady-state streaming inference.)
        return carry + jnp.sum(pred.astype(jnp.float32))

    @jax.jit
    def run_iters(params, batch_stats, batch):
        def body(carry, _):
            return step(params, batch_stats, batch, carry), ()
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=args.iters)
        return carry

    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    # warmup = one full compiled run (same executable as the timed run)
    checksum = float(run_iters(params, batch_stats, batch))
    assert np.isfinite(checksum)
    t0 = time.perf_counter()
    checksum = float(run_iters(params, batch_stats, batch))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    img_per_sec = args.batch * args.iters / dt
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / 1000.0, 4),
    }))


def bench_train(args, model, arch_spec, cfg, variables, batch, n_chips):
    """Full training-step throughput (BASELINE.json config #5): on-device
    preproc + augmentation + forward + masked-loss backward + SGD update."""
    from radar_depth_tpu.train.state import create_train_state, make_optimizer
    from radar_depth_tpu.train.step import make_train_step

    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, arch_spec, cfg, tx),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    for _ in range(args.warmup):
        state, sums = step(state, batch, key)
    assert np.isfinite(float(sums["loss"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, sums = step(state, batch, key)
    checksum = float(sums["loss"])  # forces the chain (state donation orders it)
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    per_chip = args.batch * args.iters / dt / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
