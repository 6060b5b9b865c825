"""Probe batch_group_count convs for cross-stage encoder fusion.

Both stages' image encoders consume the SAME rgb with different weights;
XLA's batch_group_count=G convs evaluate G weight sets over G batch groups
as ONE conv with G× output channels — full MXU lanes where a single 64-ch
tower pads half the lane dim. Measures the layer1 (64ch) and layer2 (128ch)
shapes of the 450×800 ResNet-18 at B=128 per tower.
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
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dn = ("NHWC", "HWIO", "NHWC")

    from scripts.bench_util import pipelined_timer

    def bench(fn, *xs):
        return pipelined_timer(fn, xs, iters=args.iters)

    rng = np.random.default_rng(0)
    b = args.batch
    for h, w, c in [(113, 200, 64), (57, 100, 128)]:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        k1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)).astype(jnp.bfloat16)
        k2 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)).astype(jnp.bfloat16)
        kcat = jnp.concatenate([k1, k2], axis=-1)  # (3,3,c,2c)

        def two_convs(x, k1, k2):
            a = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME",
                                             dimension_numbers=dn)
            bb = jax.lax.conv_general_dilated(x, k2, (1, 1), "SAME",
                                              dimension_numbers=dn)
            return a + bb

        def bg_conv(x, kcat):
            x2 = jnp.concatenate([x, x], axis=0)  # both towers' inputs
            out = jax.lax.conv_general_dilated(
                x2, kcat, (1, 1), "SAME", dimension_numbers=dn,
                batch_group_count=2)
            # out: (b, h, w, 2c) — tower g in channel group g
            return out[..., :c] + out[..., c:]

        def wide_conv(x, kcat):
            # same-input special case: one conv with 2c output channels
            out = jax.lax.conv_general_dilated(
                x, kcat, (1, 1), "SAME", dimension_numbers=dn)
            return out[..., :c] + out[..., c:]

        t2 = bench(two_convs, x, k1, k2)
        flops = 2 * 2 * b * h * w * c * c * 9
        try:
            tb = bench(bg_conv, x, kcat)
            rb = f"{tb * 1e3:7.2f}ms {flops / tb / 1e12:6.1f} TF/s"
        except Exception as e:
            rb = f"FAIL({type(e).__name__}: {str(e)[:50]})"
        tw = bench(wide_conv, x, kcat)
        print(f"{h}x{w}x{c} two towers: separate {t2 * 1e3:7.2f}ms "
              f"{flops / t2 / 1e12:6.1f} TF/s | batch_group {rb} | "
              f"wide(same-input) {tw * 1e3:7.2f}ms {flops / tw / 1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
