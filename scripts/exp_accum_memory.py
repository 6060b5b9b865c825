"""Quantify gradient accumulation's memory claim with compiled-memory
analysis (same methodology as the B>128 cliff ledger in NOTES.md): temp HBM
of the jitted train step for

  plain B=32            (the training operating point)
  accum 4 x B=32        (effective batch 128, scan-fused)
  plain B=128           (what effective batch 128 costs without accumulation)

No execution — .lower().compile().memory_analysis() only.

Usage: python scripts/exp_accum_memory.py [--height 450 --width 800]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def analyze(label, cfg, batch_leaves):
    from radar_depth_tpu.models import create_model
    from radar_depth_tpu.train.state import create_train_state, make_optimizer
    from radar_depth_tpu.train.step import init_model, make_train_step

    model, arch_spec = create_model(
        cfg.model.arch, decoder=cfg.model.decoder,
        output_size=(cfg.data.height, cfg.data.width), dtype=jnp.bfloat16)
    variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.optim, steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, arch_spec, cfg, tx,
                                   host_augmented=True),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    try:
        compiled = step.lower(state, batch_leaves, key).compile()
    except Exception as e:  # OOM at buffer assignment IS a result here
        msg = str(e)
        cut = msg.find("Largest program allocations")
        print(f"{label:24s} DOES NOT COMPILE: "
              f"{[l for l in msg[:cut].splitlines() if 'hbm' in l][:2]}")
        return None
    m = compiled.memory_analysis()
    gb = 1 / 2**30
    print(f"{label:24s} temp {m.temp_size_in_bytes * gb:6.2f} GB  "
          f"args {m.argument_size_in_bytes * gb:6.2f} GB  "
          f"out {m.output_size_in_bytes * gb:6.2f} GB  "
          f"total {(m.temp_size_in_bytes + m.argument_size_in_bytes) * gb:6.2f} GB")
    return m.temp_size_in_bytes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--sweeps", type=int, default=5)
    args = p.parse_args()

    from radar_depth_tpu.config import (DataConfig, ModelConfig, OptimConfig,
                                        TrainConfig)
    from radar_depth_tpu.data.schema import sample_dtypes, sample_shapes

    def cfg_for(accum):
        return TrainConfig(
            data=DataConfig(height=args.height, width=args.width,
                            num_sweeps=args.sweeps),
            model=ModelConfig(arch="resnet18_multistage", dtype="bfloat16"),
            optim=OptimConfig(grad_accum=accum),
            batch_size=32,
        )

    spec = cfg_for(1).data.sample_spec()
    shapes, dtypes = sample_shapes(spec), sample_dtypes()

    def fake_batch(*lead):
        return {k: jnp.zeros(tuple(lead) + shapes[k], dtypes[k])
                for k in shapes}

    analyze("plain B=32", cfg_for(1), fake_batch(32))
    analyze("accum 4 x B=32", cfg_for(4), fake_batch(4, 32))
    analyze("plain B=128", cfg_for(1), fake_batch(128))


if __name__ == "__main__":
    main()
