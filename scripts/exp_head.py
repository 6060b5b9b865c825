"""Micro-experiments for the head (conv3+resize) and decoder-tail cost
(perf scratchpad; not part of the driver contract)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_depth_tpu.models.layers import DIMSPEC, _interp_matrix


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


B, H, W, C = 128, 240, 400, 16
OH, OW = 450, 800
dt16 = jnp.bfloat16

x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, W, C)), dt16)
k3 = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, C, 1)) * 0.1, dt16)
rh32 = _interp_matrix(OH, H)
rw32 = _interp_matrix(OW, W)
rh16, rw16 = rh32.astype(dt16), rw32.astype(dt16)

HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT


def conv3(x, prec=HI):
    return jax.lax.conv_general_dilated(
        x, k3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMSPEC,
        precision=prec)


def head_current(carry, x):
    y = conv3(x)
    y32 = y.astype(jnp.float32)
    y32 = jnp.einsum("Hh,nhwc->nHwc", rh32, y32, precision=HI)
    y32 = jnp.einsum("Ww,nhwc->nhWc", rw32, y32, precision=HI)
    return carry + jnp.sum(y32)


def head_bf16(carry, x):
    y = conv3(x)
    y = jnp.einsum("Hh,nhwc->nHwc", rh16, y, precision=HI)
    y = jnp.einsum("Ww,nhwc->nhWc", rw16, y, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


def conv3_only(carry, x):
    return carry + jnp.sum(conv3(x).astype(jnp.float32))


def resize_only_f32(carry, x):
    y32 = x[..., :1].astype(jnp.float32)
    y32 = jnp.einsum("Hh,nhwc->nHwc", rh32, y32, precision=HI)
    y32 = jnp.einsum("Ww,nhwc->nhWc", rw32, y32, precision=HI)
    return carry + jnp.sum(y32)


def resize_only_bf16(carry, x):
    y = x[..., :1]
    y = jnp.einsum("Hh,nhwc->nHwc", rh16, y, precision=HI)
    y = jnp.einsum("Ww,nhwc->nhWc", rw16, y, precision=HI)
    return carry + jnp.sum(y.astype(jnp.float32))


def resize_f32_default_prec(carry, x):
    y32 = x[..., :1].astype(jnp.float32)
    y32 = jnp.einsum("Hh,nhwc->nHwc", rh32, y32, precision=DE)
    y32 = jnp.einsum("Ww,nhwc->nhWc", rw32, y32, precision=DE)
    return carry + jnp.sum(y32)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]}  B={B} {H}x{W}x{C} -> {OH}x{OW}")
    timeit(head_current, (x,), label="head current (conv3 + f32 HIGHEST resize)")
    timeit(head_bf16, (x,), label="head bf16 resize")
    timeit(conv3_only, (x,), label="conv3 only (16->1, bf16)")
    timeit(resize_only_f32, (x,), label="resize only f32 HIGHEST")
    timeit(resize_only_bf16, (x,), label="resize only bf16")
    timeit(resize_f32_default_prec, (x,), label="resize only f32 DEFAULT prec")

    # numerics: bf16 resize vs f32 resize on the bf16 conv output
    a = jax.jit(lambda x: jnp.einsum("Ww,nhwc->nhWc", rw32,
        jnp.einsum("Hh,nhwc->nHwc", rh32, conv3(x).astype(jnp.float32),
                   precision=HI), precision=HI))(x)
    b = jax.jit(lambda x: jnp.einsum("Ww,nhwc->nhWc", rw16,
        jnp.einsum("Hh,nhwc->nHwc", rh16, conv3(x), precision=HI),
        precision=HI).astype(jnp.float32))(x)
    a, b = np.asarray(a), np.asarray(b)
    denom = np.abs(a).max()
    print(f"max-abs diff bf16 vs f32 resize: {np.abs(a - b).max():.5f} "
          f"(rel {np.abs(a - b).max() / denom:.2e}, scale {denom:.2f})")
