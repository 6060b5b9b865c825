"""Micro-experiments round 3: maxpool formulations + space-to-depth stem
(perf scratchpad)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_depth_tpu.models.layers import DIMSPEC

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


def conv(x, k, stride=1, pad=3):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=DIMSPEC, precision=HI)


B = 128
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]}  B={B} bf16")

y0 = jnp.asarray(rng.normal(size=(B, 225, 400, 64)), dtype)  # conv1 output


def mp_rw(carry, y):
    z = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return carry + jnp.sum(z.astype(jnp.float32))


def mp_sep(carry, y):
    z = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 1, 1),
                              (1, 2, 1, 1), ((0, 0), (1, 1), (0, 0), (0, 0)))
    z = jax.lax.reduce_window(z, -jnp.inf, jax.lax.max, (1, 1, 3, 1),
                              (1, 1, 2, 1), ((0, 0), (0, 0), (1, 1), (0, 0)))
    return carry + jnp.sum(z.astype(jnp.float32))


def _mp_slices(y):
    neg = jnp.asarray(-np.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    h_out = (y.shape[1] + 1) // 2
    w_out = (y.shape[2] + 1) // 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(yp, (0, dy, dx, 0),
                               (B, dy + 2 * h_out - 1, dx + 2 * w_out - 1, 64),
                               (1, 2, 2, 1))
            acc = sl if acc is None else jnp.maximum(acc, sl)
    return acc


def mp_slices(carry, y):
    return carry + jnp.sum(_mp_slices(y).astype(jnp.float32))


timeit(mp_rw, (y0,), label="maxpool reduce_window 3x3 s2 (current)")
timeit(mp_sep, (y0,), label="maxpool separable two-pass")
timeit(mp_slices, (y0,), label="maxpool strided slices + maximum")
a = jax.jit(lambda y: mp_rw(jnp.zeros(()), y))(y0)
c = jax.jit(lambda y: mp_slices(jnp.zeros(()), y))(y0)
print(f"  checksum rw={float(a):.1f} slices={float(c):.1f}")

# ---- stem variants: 7x7 s2 3->64 at 450x800
ximg = jnp.asarray(rng.normal(size=(B, 450, 800, 3)), dtype)
k7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, dtype)


def stem_direct(carry, x):
    return carry + jnp.sum(conv(x, k7, stride=2, pad=3).astype(jnp.float32))


def s2d2(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2, 4 * c)


# 7x7 s2 conv == 4x4 s1 conv on s2d(2) input with phase-expanded kernel.
# Build the (4,4,4C,64) kernel: tap (2i+a, 2j+b) of the 8x8 zero-padded 7x7
# kernel goes to position (i, j), input channel block (a*2+b).
def s2d_kernel(k8):
    assert k8.shape[0] == 8 and k8.shape[1] == 8
    c = k8.shape[2]
    out = jnp.zeros((4, 4, 4 * c, 64), k7.dtype)
    for a in range(2):
        for b in range(2):
            blk = k8[a::2, b::2]  # (4,4,C,64)
            out = out.at[:, :, (a * 2 + b) * c:(a * 2 + b + 1) * c, :].set(blk)
    return out


# left-pad the 7x7 kernel by 1 to align taps with the s2d(2) grid → 8x8
ks2d = s2d_kernel(jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0))))


def stem_s2d(carry, x):
    # pad 4 rows/cols total (pad=3 plus 1 alignment) then s2d: output matches
    # conv(x, k7, s2, pad=3) exactly (checksum below).
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    xs = s2d2(xp)
    y = jax.lax.conv_general_dilated(
        xs, ks2d, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=DIMSPEC, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


timeit(stem_direct, (ximg,), label="stem 7x7 s2 direct (current)")
timeit(stem_s2d, (ximg,), label="stem s2d(2) + 4x4 conv")
a = jax.jit(lambda x: stem_direct(jnp.zeros(()), x))(ximg)
b = jax.jit(lambda x: stem_s2d(jnp.zeros(()), x))(ximg)
print(f"  checksum direct={float(a):.1f} s2d={float(b):.1f}")

# radar stem: 1 channel
xrad = jnp.asarray(rng.normal(size=(B, 450, 800, 1)), dtype)
k7r = jnp.asarray(rng.normal(size=(7, 7, 1, 64)) * 0.05, dtype)
timeit(lambda c, x: c + jnp.sum(conv(x, k7r, stride=2, pad=3).astype(jnp.float32)),
       (xrad,), label="radar stem 7x7 s2 1->64 direct")
