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
    p.add_argument("--arch", default="resnet18_multistage",
                   help="model for the full-forward row and encoder depth "
                        "(e.g. resnet50_latefusion — VERDICT r4 #5)")
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
    import re

    depth = int(re.match(r"resnet(\d+)", args.arch).group(1))
    x_img = jnp.zeros((B, H, W, 3), dtype)
    x_rad = jnp.zeros((B, H, W, 1), dtype)
    enc = ResNetEncoder(depth=depth, in_channels=3, dtype=dtype)
    bench_module(enc, x_img, f"img ResNet{depth} encoder (3ch)")
    encr = ResNetEncoder(depth=depth, in_channels=1, dtype=dtype)
    bench_module(encr, x_rad, f"radar ResNet{depth} encoder (1ch)")

    # decoder: full + per block. Bottleneck (resnet50) tops out at 2048ch ->
    # the 1x1 bottleneck conv maps to 1024-in decoders; BasicBlock to 256.
    top_c = 256 if depth < 50 else 1024
    hb = -(-H // 32)
    wb = -(-W // 32)
    x_dec = jnp.zeros((B, hb, wb, top_c), dtype)
    dec = Decoder(kind="upproj", in_channels=top_c, dtype=dtype)
    bench_module(dec, x_dec, "decoder upproj (4 blocks)")
    hh, ww, cc = hb, wb, top_c
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

    # full model forward (no preproc)
    model, spec_a = create_model(args.arch, decoder="upproj",
                                 output_size=(H, W), dtype=dtype)
    v = model.init(rng, x_img.astype(jnp.float32),
                   x_rad[..., 0].astype(jnp.float32)[..., None], False)

    def full(carry, v, rgb, radar):
        out = model.apply(v, rgb, radar, False)
        pred = out[1] if spec_a.multistage else out
        return carry + jnp.sum(pred.astype(jnp.float32))

    timeit(full, (v, x_img.astype(jnp.float32), x_rad.astype(jnp.float32)),
           label=f"{args.arch} full forward")


if __name__ == "__main__":
    main()
