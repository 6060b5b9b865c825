"""Component-level throughput profile of the flagship two-stage model on the
real device (pipelined timing per NOTES.md methodology). Guides perf work —
not part of the driver contract.

Usage: python scripts/profile_components.py [--batch 128] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=8, warmup=2, label=""):
    """Pipelined: chain a scalar carry, fetch once."""
    jfn = jax.jit(fn)
    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = jfn(carry, *args)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = jfn(carry, *args)
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    # cost analysis for FLOPs
    try:
        cost = jfn.lower(carry, *args).compile().cost_analysis()
        flops = cost.get("flops", 0.0)
    except Exception:
        flops = 0.0
    tf = flops / dt / 1e12 if flops else 0.0
    print(f"{label:42s} {dt * 1e3:9.2f} ms  {flops / 1e9:8.1f} GF  {tf:6.1f} TF/s")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--width", type=int, default=800)
    args = p.parse_args()

    from flax import linen as nn

    from radar_depth_tpu.models import create_model
    from radar_depth_tpu.models.decoders import Decoder, UpProjBlock
    from radar_depth_tpu.models.layers import resize_bilinear_matmul
    from radar_depth_tpu.models.resnet import ResNetEncoder

    B = args.batch
    H, W = args.height, args.width
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    rng = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}, B={B}, {H}x{W}, {args.dtype}")

    def bench_module(mod, x, label, train=False):
        vars_ = mod.init(rng, x, train)
        def fn(carry, v, x):
            y = mod.apply(v, x, train)
            return carry + jnp.sum(y.astype(jnp.float32))
        return timeit(fn, (vars_, x), label=label)

    # encoders
    x_img = jnp.zeros((B, H, W, 3), dtype)
    x_rad = jnp.zeros((B, H, W, 1), dtype)
    enc = ResNetEncoder(depth=18, in_channels=3, dtype=dtype)
    bench_module(enc, x_img, "img ResNet18 encoder (3ch)")
    encr = ResNetEncoder(depth=18, in_channels=1, dtype=dtype)
    bench_module(encr, x_rad, "radar ResNet18 encoder (1ch)")

    # decoder: full + per block
    hb, wb = 15, 25  # H/32 ceil for 450x800 (conv chain)
    x_dec = jnp.zeros((B, hb, wb, 256), dtype)
    dec = Decoder(kind="upproj", in_channels=256, dtype=dtype)
    bench_module(dec, x_dec, "decoder upproj (4 blocks)")
    hh, ww, cc = hb, wb, 256
    for i in range(4):
        blk = UpProjBlock(cc // 2, dtype=dtype)
        xb = jnp.zeros((B, hh, ww, cc), dtype)
        bench_module(blk, xb, f"  upproj block{i + 1} {hh}x{ww}x{cc}->{cc // 2}")
        hh, ww, cc = hh * 2, ww * 2, cc // 2

    # head + resize
    x_head = jnp.zeros((B, hh, ww, cc), dtype)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            y = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=dtype, precision=jax.lax.Precision.HIGHEST)(x)
            return resize_bilinear_matmul(y, H, W)

    bench_module(Head(), x_head, f"head conv3+resize {hh}x{ww}x{cc}")

    # full two-stage forward (no preproc)
    model, spec_a = create_model("resnet18_multistage", decoder="upproj",
                                 output_size=(H, W), dtype=dtype)
    v = model.init(rng, x_img.astype(jnp.float32), x_rad[..., 0].astype(jnp.float32)[..., None], False)

    def full(carry, v, rgb, radar):
        c, r = model.apply(v, rgb, radar, False)
        return carry + jnp.sum(r.astype(jnp.float32))

    timeit(full, (v, x_img.astype(jnp.float32), x_rad.astype(jnp.float32)),
           label="two-stage full forward")


if __name__ == "__main__":
    main()
