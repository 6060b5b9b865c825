"""Micro-experiments round 2: VPU conv3 head, grouped dual-encoder convs,
stem/maxpool costs (perf scratchpad)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_depth_tpu.models.layers import DIMSPEC, _interp_matrix

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
    print(f"{label:56s} {dt * 1e3:8.2f} ms")
    return dt


def conv(x, k, stride=1, pad=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DIMSPEC, feature_group_count=groups, precision=HI)


B = 128
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]}  B={B} bf16")

# ---------------- head: conv3 16->1 formulations at (240,400)
x16 = jnp.asarray(rng.normal(size=(B, 240, 400, 16)) * 0.1, dtype)
k3 = jnp.asarray(rng.normal(size=(3, 3, 16, 1)) * 0.1, dtype)
rh = _interp_matrix(450, 240).astype(dtype)
rw = _interp_matrix(800, 400).astype(dtype)


def head_mxu(carry, x):
    y = conv(x, k3, pad=1)
    y = jnp.einsum("Hh,nhwc->nHwc", rh, y, precision=HI)
    y = jnp.einsum("Ww,nhwc->nhWc", rw, y, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


def conv3_vpu(x):
    # 9 shifted multiply-adds + channel reduce — keeps the MXU out of a
    # 1-output-channel op that would waste 127/128 lanes.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy: dy + h, dx: dx + w, :]
            term = sl * k3[dy, dx, :, 0]
            acc = term if acc is None else acc + term
    return jnp.sum(acc, axis=-1, keepdims=True)


def head_vpu(carry, x):
    y = conv3_vpu(x)
    y = jnp.einsum("Hh,nhwc->nHwc", rh, y, precision=HI)
    y = jnp.einsum("Ww,nhwc->nhWc", rw, y, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


def head_vpu_dotlast(carry, x):
    # contract channels first via a (16,) dot on each of 9 shifts
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy: dy + h, dx: dx + w, :]
            term = sl @ k3[dy, dx]  # (B,H,W,1)
            acc = term if acc is None else acc + term
    y = jnp.einsum("Hh,nhwc->nHwc", rh, acc, precision=HI)
    y = jnp.einsum("Ww,nhwc->nhWc", rw, y, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


timeit(head_mxu, (x16,), label="head conv3 MXU + bf16 resize (baseline)")
timeit(head_vpu, (x16,), label="head conv3 VPU shifts + bf16 resize")
timeit(head_vpu_dotlast, (x16,), label="head conv3 VPU dot-last + bf16 resize")
a = jax.jit(lambda x: head_mxu(jnp.zeros(()), x))(x16)
b = jax.jit(lambda x: head_vpu(jnp.zeros(()), x))(x16)
print(f"  checksum mxu={float(a):.2f} vpu={float(b):.2f}")

# ---------------- grouped dual-encoder convs (img+radar same-shape layers)
H1, W1 = 113, 200
xa = jnp.asarray(rng.normal(size=(B, H1, W1, 64)) * 0.1, dtype)
xb = jnp.asarray(rng.normal(size=(B, H1, W1, 64)) * 0.1, dtype)
ka = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, dtype)
kb = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, dtype)
kg = jnp.concatenate([ka, kb], axis=-1)  # grouped: (3,3,64,128), G=2
xcat = jnp.concatenate([xa, xb], axis=-1)


def two_convs(carry, xa, xb):
    ya = conv(xa, ka)
    yb = conv(xb, kb)
    return carry + jnp.sum(ya.astype(jnp.float32)) + jnp.sum(yb.astype(jnp.float32))


def grouped_conv(carry, xcat):
    y = conv(xcat, kg, groups=2)
    return carry + jnp.sum(y.astype(jnp.float32))


def batched_conv(carry, xa, xb):
    # batch-concat with shared shape but different weights is impossible;
    # this is the per-branch upper bound with doubled batch (same weights) —
    # measures whether B=256 of one conv beats 2 dispatches of B=128.
    x2 = jnp.concatenate([xa, xb], axis=0)
    y = conv(x2, ka)
    return carry + jnp.sum(y.astype(jnp.float32))


timeit(two_convs, (xa, xb), label="layer1 conv 64->64 x2 separate (113x200)")
timeit(grouped_conv, (xcat,), label="layer1 conv 128->128 groups=2")
timeit(batched_conv, (xa, xb), label="layer1 conv 64->64 batch-doubled")

# layer2 case: 128ch at 57x100
xa2 = jnp.asarray(rng.normal(size=(B, 57, 100, 128)) * 0.1, dtype)
xb2 = jnp.asarray(rng.normal(size=(B, 57, 100, 128)) * 0.1, dtype)
ka2 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, dtype)
kb2 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, dtype)
kg2 = jnp.concatenate([ka2, kb2], axis=-1)
xcat2 = jnp.concatenate([xa2, xb2], axis=-1)
timeit(lambda c, xa, xb: c + jnp.sum(conv(xa, ka2).astype(jnp.float32))
       + jnp.sum(conv(xb, kb2).astype(jnp.float32)), (xa2, xb2),
       label="layer2 conv 128->128 x2 separate (57x100)")
timeit(lambda c, x: c + jnp.sum(conv(x, kg2, groups=2).astype(jnp.float32)),
       (xcat2,), label="layer2 conv 256->256 groups=2")

# ---------------- stem + maxpool costs
ximg = jnp.asarray(rng.normal(size=(B, 450, 800, 3)), dtype)
k7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, dtype)


def stem(carry, x):
    y = conv(x, k7, stride=2, pad=3)
    return carry + jnp.sum(y.astype(jnp.float32))


def stem_pool(carry, x):
    y = conv(x, k7, stride=2, pad=3)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return carry + jnp.sum(y.astype(jnp.float32))


timeit(stem, (ximg,), label="stem conv1 7x7 s2 3->64 (450x800)")
timeit(stem_pool, (ximg,), label="stem conv1 + maxpool3 s2")
