"""Probe int8 conv/matmul throughput vs bf16 on the local device.

v5e's MXU does 394 TOPS int8 vs 197 TFLOP/s bf16 on paper; if the relay
shows a similar ratio, a post-training-quantized inference path is worth
building. Pipelined timing (lax.scan + scalar fetch, NOTES.md methodology).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.bench_util import pipelined_timer

    def bench(fn, *xs):
        return pipelined_timer(fn, xs, iters=args.iters)

    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    # encoder-ish conv: B=128, 57x100, 128->128ch, 3x3 (layer2-scale of the
    # 450x800 ResNet18)
    for h, w, c in [(57, 100, 128), (29, 50, 256)]:
        x8 = jnp.asarray(rng.integers(-127, 127, (128, h, w, c), np.int8))
        k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c), np.int8))
        xb = x8.astype(jnp.bfloat16)
        kb = k8.astype(jnp.bfloat16)

        def conv_i8(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        def conv_bf(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn)

        flops = 2 * 128 * h * w * c * c * 9
        try:
            t8 = bench(conv_i8, x8, k8)
            r8 = f"{t8 * 1e3:7.2f}ms {flops / t8 / 1e12:6.1f} TOP/s"
        except Exception as e:
            r8 = f"FAIL({type(e).__name__}: {str(e)[:60]})"
        tb = bench(conv_bf, xb, kb)
        print(f"conv3x3 {h}x{w}x{c}: int8 {r8} | bf16 {tb * 1e3:7.2f}ms "
              f"{flops / tb / 1e12:6.1f} TF/s", flush=True)

    # plain matmul comparison
    for n in [4096]:
        a8 = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))
        ab = a8.astype(jnp.bfloat16)
        bb = b8.astype(jnp.bfloat16)

        def mm_i8(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

        def mm_bf(a, b):
            return jax.lax.dot(a, b)

        flops = 2 * n**3
        try:
            t8 = bench(mm_i8, a8, b8)
            r8 = f"{t8 * 1e3:7.2f}ms {flops / t8 / 1e12:6.1f} TOP/s"
        except Exception as e:
            r8 = f"FAIL({type(e).__name__}: {str(e)[:60]})"
        tb = bench(mm_bf, ab, bb)
        print(f"matmul {n}^3:        int8 {r8} | bf16 {tb * 1e3:7.2f}ms "
              f"{flops / tb / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
