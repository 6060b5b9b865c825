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


def _device_count_or_die(timeout_s: int) -> int:
    """First device touch, watchdogged. The relay backend can wedge so that
    jax.devices() blocks FOREVER in the TPU-claim leg (observed r3: outage
    froze every client with zero CPU progress) — a hung bench would stall
    the whole driver run. A daemon watchdog hard-exits with a diagnostic on
    stderr instead; rc=3 tells the driver 'environment, not framework'."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            sys.stderr.write(
                f"bench.py: jax.device_count() still blocked after "
                f"{timeout_s}s — device relay unreachable (see NOTES.md "
                "relay-outage row); aborting instead of hanging\n")
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    n = jax.device_count()
    done.set()
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--repeat", type=int, default=3,
                   help="timed repetitions of the measurement loop; the JSON "
                        "value is the median and min/max/mean ride along — "
                        "the gate number carries its own error bar "
                        "(VERDICT r4 #3: N=1 each round left a 0.03% margin "
                        "unexplained)")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--sweeps", type=int, default=5)
    p.add_argument("--arch", default="resnet18_multistage")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="train mode: micro-batches per optimizer step "
                        "(one jitted scan; effective batch = N x --batch)")
    p.add_argument("--mode", default="infer",
                   choices=["infer", "train", "stream"],
                   help="infer: preproc+forward, batch resident on device "
                        "(the driver metric); train: full step incl. "
                        "augmentation, backward, SGD update; stream: "
                        "double-buffered host->device upload per step — "
                        "throughput INCLUDING transfer (VERDICT r2 #4)")
    p.add_argument("--stream-iters", type=int, default=8,
                   help="streaming-mode steps (each uploads a full batch; "
                        "on the bench relay transfer runs ~0.03 GB/s, so "
                        "keep this small)")
    args = p.parse_args()

    from radar_depth_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from radar_depth_tpu.data.schema import SampleSpec
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.models import create_model
    from radar_depth_tpu.ops.preprocess import (
        PreprocessConfig,
        pack_model_inputs,
        prepare_eval_batch,
    )

    n_chips = _device_count_or_die(timeout_s=600)
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
    from radar_depth_tpu.config import (DataConfig, ModelConfig, OptimConfig,
                                        TrainConfig)

    cfg = TrainConfig(
        data=DataConfig(height=spec.height, width=spec.width,
                        num_sweeps=spec.num_sweeps),
        model=ModelConfig(arch=args.arch, dtype=args.dtype),
        optim=OptimConfig(grad_accum=max(1, args.grad_accum)),
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
    dts = []
    for _ in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        checksum = float(run_iters(params, batch_stats, batch))
        dts.append(time.perf_counter() - t0)
        assert np.isfinite(checksum)
    rates = sorted(args.batch * args.iters / d / n_chips for d in dts)
    per_chip = rates[len(rates) // 2] if len(rates) % 2 else (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2

    # MFU: end-to-end model FLOPs (preproc + two-stage forward, from XLA's
    # own cost model over the exact executed graph) per wall second, vs the
    # device's bf16 peak. Cost-analyze a SINGLE step, not the scanned loop:
    # HLO cost analysis counts a while/scan body ONCE, not ×trip-count
    # (measured here: the scan graph reported exactly iters× too few flops).
    # Two denominators ride the JSON: the v5e nominal 197 TFLOP/s, and this
    # relay's MEASURED conv peak 114 TFLOP/s (NOTES.md "Device/runtime
    # facts") — on the relay the latter is the achievable ceiling. Never
    # gates: cost_analysis is unsupported on some PJRT backends.
    mfu = {}
    try:
        one = jax.jit(lambda p, bs, b: step(p, bs, b,
                                            jnp.zeros((), jnp.float32)))
        lowered = one.lower(params, batch_stats, batch)
        try:
            flops = float(lowered.cost_analysis()["flops"])
        except Exception:
            flops = float(lowered.compile().cost_analysis()["flops"])
        flops_per_img = flops / args.batch
        tfs = flops_per_img * per_chip / 1e12
        mfu = {
            "model_tflops_per_sec": round(tfs, 2),
            "gflops_per_image": round(flops_per_img / 1e9, 2),
            "mfu_vs_v5e_nominal_197": round(tfs / 197.0, 4),
            "mfu_vs_measured_conv_peak_114": round(tfs / 114.0, 4),
        }
    except Exception:
        pass

    if args.mode == "stream":
        # Honest served-traffic measurement: every step uploads a fresh raw
        # batch (jnp.asarray = host->device transfer) and dispatches the same
        # fused preproc+forward graph, two dispatches in flight so upload of
        # batch i+1 overlaps compute of batch i (Predictor.predict_stream
        # semantics). Includes host->device bandwidth — on this relay that
        # link runs ~0.03 GB/s (NOTES.md "relay facts"), so the number here
        # benchmarks the relay link, not the framework; on direct-attached
        # TPU hosts (PCIe/ICI ~10+ GB/s) transfer is a few ms/batch and
        # stream converges to the resident number.
        from collections import deque

        @jax.jit
        def one_step(params, batch_stats, batch):
            prepared = prepare_eval_batch(batch, pre_cfg)
            inputs = pack_model_inputs(prepared, arch_spec.input_kind)
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              *inputs, train=False)
            pred = out[1] if arch_spec.multistage else out
            return jnp.sum(pred.astype(jnp.float32))

        # two distinct host buffers so uploads cannot be cached/aliased
        host_a = host_batch
        host_b = {k: v.copy() for k, v in host_batch.items()}
        float(one_step(params, batch_stats,
                       {k: jnp.asarray(v) for k, v in host_b.items()}))
        inflight = deque()
        t0 = time.perf_counter()
        for i in range(args.stream_iters):
            src = host_a if i % 2 == 0 else host_b
            dev = {k: jnp.asarray(v) for k, v in src.items()}
            inflight.append(one_step(params, batch_stats, dev))
            if len(inflight) >= 2:
                assert np.isfinite(float(inflight.popleft()))
        while inflight:
            assert np.isfinite(float(inflight.popleft()))
        sdt = time.perf_counter() - t0
        stream_per_chip = args.batch * args.stream_iters / sdt / n_chips
        print(json.dumps({
            "metric": "stream_images_per_sec_per_chip",
            "value": round(stream_per_chip, 2),
            "unit": "img/s/chip",
            "vs_baseline": round(stream_per_chip / 1000.0, 4),
            "resident_images_per_sec_per_chip": round(per_chip, 2),
        }))
        return

    out = {
        "metric": "images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / 1000.0, 4),
        "repeats": len(rates),
        "min": round(rates[0], 2),
        "max": round(rates[-1], 2),
        "mean": round(sum(rates) / len(rates), 2),
    }
    out.update(mfu)
    print(json.dumps(out))


def bench_train(args, model, arch_spec, cfg, variables, batch, n_chips):
    """Full training-pipeline throughput (BASELINE.json config #5): native
    loader with WORKER-SIDE augmentation (reference DataLoader semantics,
    overlapped with device compute) feeding the jitted step (on-device
    preproc + forward + masked-loss backward + SGD update). Measures the
    steady-state Trainer hot loop: host batch → device_put → async step."""
    import os

    from radar_depth_tpu.data.packed import (
        NativeBatchLoader,
        PackedDataset,
        native_available,
        write_shard,
    )
    from radar_depth_tpu.data.synthetic import SyntheticNuScenes
    from radar_depth_tpu.train.state import create_train_state, make_optimizer
    from radar_depth_tpu.train.step import make_train_step

    spec = cfg.data.sample_spec()
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    host_aug = native_available()
    key = jax.random.PRNGKey(0)

    host_rate = None
    loader_threads = max(2, (os.cpu_count() or 1))
    if host_aug:
        # One REAL host-augmented batch, resident on device: the metric is
        # the device-side step throughput, which on production hardware IS
        # the pipeline throughput (host augmentation runs overlapped in the
        # loader's worker threads, and PCIe transfer of ~100 MB/batch is
        # ~10 ms). On this benchmarking relay, per-step host->device
        # transfer runs at ~0.03 GB/s (network artifact), so a streaming
        # measurement would benchmark the relay, not the framework; the
        # loader's own measured throughput rides the SAME JSON line
        # (loader_img_per_sec) so input-pipeline capacity is a first-class
        # benchmark output (VERDICT r2 #1). Feeding 8 chips needs
        # 8 x value/chip from one host: divide loader_img_per_sec by the
        # measured per-core rate (NOTES.md) to size the host.
        n_samples = max(2 * args.batch, 256)
        shard = (f"/tmp/rdtp_bench_{spec.height}x{spec.width}"
                 f"_s{spec.num_sweeps}_n{n_samples}/data.rdtp")
        if not os.path.exists(shard):
            ds = SyntheticNuScenes(n_samples, spec=spec, seed=0)
            write_shard(shard, (ds[i] for i in range(n_samples)))
        dataset = PackedDataset(shard)
        loader = NativeBatchLoader(dataset, args.batch, shuffle=True, seed=0,
                                   queue_depth=4, threads=loader_threads,
                                   augment=cfg.augment)
        next(loader)  # warm workers + page cache
        t0 = time.perf_counter()
        host_batches = 8
        recent = []
        for _ in range(host_batches):
            host_batch = next(loader)
            recent.append(host_batch)
            recent = recent[-max(1, cfg.optim.grad_accum):]
        host_rate = args.batch * host_batches / (time.perf_counter() - t0)
        if cfg.optim.grad_accum > 1:
            # grad-accum step consumes an (A, B, ...) stack of micro-batches
            while len(recent) < cfg.optim.grad_accum:
                recent.append(next(loader))
            batch = {k: jnp.asarray(np.stack([r[k] for r in recent]))
                     for k in recent[0]}
        else:
            batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        loader.close()
        dataset.close()

    accum = max(1, cfg.optim.grad_accum)
    if accum > 1 and not host_aug:
        ds = SyntheticNuScenes(args.batch * accum, spec=spec, seed=0)
        micros = [ds.batch(range(i * args.batch, (i + 1) * args.batch))
                  for i in range(accum)]
        batch = {k: jnp.asarray(np.stack([m[k] for m in micros]))
                 for k in micros[0]}

    step_fn = make_train_step(model, arch_spec, cfg, tx,
                              host_augmented=host_aug)

    @jax.jit
    def run_iters(state, batch):
        def body(state, _):
            # thread a params-dependent epsilon into the raw inputs so the
            # per-step preprocessing cannot be hoisted out of the scan (in
            # real training every batch is new data)
            eps = jnp.sum(
                jax.tree_util.tree_leaves(state.params)[0].astype(jnp.float32)
                .ravel()[:1]) * 1e-30
            b = dict(batch,
                     radar_points=batch["radar_points"] + eps,
                     image=batch["image"])
            state, sums = step_fn(state, b, key)
            return state, sums["loss"]
        state, losses = jax.lax.scan(body, state, None, length=args.iters)
        return state, losses[-1]
    state, loss = run_iters(state, batch)  # warmup = compile + full run
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    state, loss = run_iters(state, batch)
    checksum = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    per_chip = args.batch * accum * args.iters / dt / n_chips
    out = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / 1000.0, 4),
    }
    if accum > 1:
        out["grad_accum"] = accum
    if host_rate is not None:
        out["loader_img_per_sec"] = round(host_rate, 1)
        out["loader_threads"] = loader_threads
    print(json.dumps(out))


if __name__ == "__main__":
    main()
