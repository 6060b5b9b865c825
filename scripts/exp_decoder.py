"""Micro-experiments: decoder tail formulations (perf scratchpad).

Block shapes for 450x800 two-stage upproj: block3 (60,100,64)->(120,200,32),
block4 (120,200,32)->(240,400,16). Variants:
  A dilated   : two 5x5 lhs_dilation=2 convs (current default)
  B phase     : two 3x3 phase convs C->4K + d2s each
  C phasefuse : ONE 3x3 phase conv C->8K (branches concatenated) + split
  D packedblk : whole block packed (conv3 also packed), one d2s at end
Plus head variants on packed vs direct input.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_depth_tpu.models.layers import (
    DIMSPEC,
    _interp_matrix,
    depth_to_space2,
    phase_unpool_conv_kernels,
)
from radar_depth_tpu.models.packed import packed_conv3_kernels

HI = jax.lax.Precision.HIGHEST


def timeit(fn, args, iters=10, warmup=2, label=""):
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
    print(f"{label:54s} {dt * 1e3:8.2f} ms")
    return dt


def conv(x, k, pad=1, lhs_dilation=None, pads=None):
    padding = pads if pads is not None else ((pad, pad), (pad, pad))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, lhs_dilation=lhs_dilation,
        dimension_numbers=DIMSPEC, precision=HI)


def block_variants(B, H, W, C, dtype):
    K = C // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 0.1, dtype)
    k51 = jnp.asarray(rng.normal(size=(5, 5, C, K)) * 0.05, dtype)  # branch1
    k52 = jnp.asarray(rng.normal(size=(5, 5, C, K)) * 0.05, dtype)  # branch2
    k3 = jnp.asarray(rng.normal(size=(3, 3, K, K)) * 0.05, dtype)

    pads_dil = ((2, 3), (2, 3))

    def blk_dilated(carry, x):
        b1 = jax.nn.relu(conv(x, k51, lhs_dilation=(2, 2), pads=pads_dil))
        b1 = conv(b1, k3, pad=1)
        b2 = conv(x, k52, lhs_dilation=(2, 2), pads=pads_dil)
        y = jax.nn.relu(b1 + b2)
        return carry + jnp.sum(y.astype(jnp.float32))

    p1 = phase_unpool_conv_kernels(k51)
    p2 = phase_unpool_conv_kernels(k52)
    pcat = jnp.concatenate([p1, p2], axis=-1)  # (3,3,C,8K): [4K b1 | 4K b2]
    pk3 = packed_conv3_kernels(k3)

    def blk_phase(carry, x):
        b1 = jax.nn.relu(depth_to_space2(conv(x, p1, pad=1)))
        b1 = conv(b1, k3, pad=1)
        b2 = depth_to_space2(conv(x, p2, pad=1))
        y = jax.nn.relu(b1 + b2)
        return carry + jnp.sum(y.astype(jnp.float32))

    def blk_phasefuse(carry, x):
        y = conv(x, pcat, pad=1)  # (H, W, 8K)
        b1 = jax.nn.relu(depth_to_space2(y[..., :4 * K]))
        b1 = conv(b1, k3, pad=1)
        b2 = depth_to_space2(y[..., 4 * K:])
        out = jax.nn.relu(b1 + b2)
        return carry + jnp.sum(out.astype(jnp.float32))

    def blk_packed(carry, x):
        y = conv(x, pcat, pad=1)  # (H, W, 8K)
        b1 = jax.nn.relu(y[..., :4 * K])
        b1 = conv(b1, pk3, pad=1)  # packed 3x3, stays (H, W, 4K)
        out = jax.nn.relu(b1 + y[..., 4 * K:])
        out = depth_to_space2(out)
        return carry + jnp.sum(out.astype(jnp.float32))

    tag = f"{H}x{W}x{C}->{K}"
    timeit(blk_dilated, (x,), label=f"block {tag} A dilated (current)")
    timeit(blk_phase, (x,), label=f"block {tag} B phase per-branch")
    timeit(blk_phasefuse, (x,), label=f"block {tag} C phase fused-branch")
    timeit(blk_packed, (x,), label=f"block {tag} D fully packed")

    # equivalence spot-check (fused vs dilated)
    a = jax.jit(lambda x: blk_dilated(jnp.zeros(()), x))(x)
    c = jax.jit(lambda x: blk_phasefuse(jnp.zeros(()), x))(x)
    d = jax.jit(lambda x: blk_packed(jnp.zeros(()), x))(x)
    print(f"  checksum A={float(a):.1f} C={float(c):.1f} D={float(d):.1f}")


def head_variants(B, dtype):
    rng = np.random.default_rng(1)
    H2, W2, K = 120, 200, 16  # packed layout of the (240,400,16) tail
    xp = jnp.asarray(rng.normal(size=(B, H2, W2, 4 * K)) * 0.1, dtype)
    k3 = jnp.asarray(rng.normal(size=(3, 3, K, 1)) * 0.1, dtype)
    rh = _interp_matrix(450, 240).astype(dtype)
    rw = _interp_matrix(800, 400).astype(dtype)
    pk3 = packed_conv3_kernels(k3)  # (3,3,64,4)

    def head_direct(carry, xp):
        x = depth_to_space2(xp)  # (240,400,16)
        y = conv(x, k3, pad=1)
        y = jnp.einsum("Hh,nhwc->nHwc", rh, y, precision=HI)
        y = jnp.einsum("Ww,nhwc->nhWc", rw, y, precision=HI)
        return carry + jnp.sum(y.astype(jnp.float32))

    def head_packed(carry, xp):
        y = conv(xp, pk3, pad=1)  # (120,200,4)
        y = depth_to_space2(y)  # (240,400,1)
        y = jnp.einsum("Hh,nhwc->nHwc", rh, y, precision=HI)
        y = jnp.einsum("Ww,nhwc->nhWc", rw, y, precision=HI)
        return carry + jnp.sum(y.astype(jnp.float32))

    timeit(head_direct, (xp,), label="head: d2s -> conv3 -> bf16 resize")
    timeit(head_packed, (xp,), label="head: packed conv3 -> d2s -> resize")
    a = jax.jit(lambda xp: head_direct(jnp.zeros(()), xp))(xp)
    b = jax.jit(lambda xp: head_packed(jnp.zeros(()), xp))(xp)
    print(f"  checksum direct={float(a):.2f} packed={float(b):.2f}")


if __name__ == "__main__":
    B = 128
    dtype = jnp.bfloat16
    print(f"device={jax.devices()[0]}  B={B} bf16")
    block_variants(B, 120, 200, 32, dtype)  # block4
    block_variants(B, 60, 100, 64, dtype)   # block3
    head_variants(B, dtype)
