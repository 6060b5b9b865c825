"""Experiment: can the 64-channel layer1 convs (output-lane-bound on a
128-lane MXU) be reformulated in phase (space-to-depth) space?

The candidate: a stride-1 3x3 conv with 64 output channels computed as a
stride-2 4x4 conv producing 256 channels (the four output phases interleaved
in the channel dim) followed by depth_to_space. MACs grow 1.78x (4*4*64 taps
vs 3*3*64) but the output fills 256 lanes instead of 64. Net win requires the
phase conv to run >1.78x the TF/s of the 64-ch conv.

Measures, at the flagship layer1 shape (B=128, 113x200, bf16, HIGHEST):
  1. every encoder conv shape standalone (where does forward time go);
  2. the 3x3 64->64 conv vs its phase-domain equivalent (+ d2s);
  3. exactness of the reformulation vs the direct conv (f32).

Not part of the driver contract; informs NOTES.md perf ledger.
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

from radar_depth_tpu.models.layers import DIMSPEC, depth_to_space2


def timeit(fn, args, iters=10, warmup=3, label=""):
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
    try:
        cost = jfn.lower(carry, *args).compile().cost_analysis()
        flops = cost.get("flops", 0.0)
    except Exception:
        flops = 0.0
    tf = flops / dt / 1e12 if flops else 0.0
    print(f"{label:46s} {dt * 1e3:8.2f} ms {flops / 1e9:9.1f} GF {tf:6.1f} TF/s")
    return dt


def conv(x, k, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=DIMSPEC, precision=jax.lax.Precision.HIGHEST)


def phase_kernel_4x4(k3: jax.Array) -> jax.Array:
    """(3,3,C,F) stride-1 kernel -> (4,4,C,4F) stride-2 kernel whose output
    channels are the four spatial output phases (2i+j) interleaved.

    Derivation: output phase (i,j) at stride-2 window position (h,w) (window
    anchored at original row 2h-1, col 2w-1 via padding=1) is the original
    output at (2h+i, 2w+j) = sum_{dy,dx} k3[dy+1, dx+1] * x[2h+i+dy, 2w+j+dx].
    The window covers x rows 2h-1+r, r in 0..3, so tap r contributes iff
    r = i+dy+1, i.e. k4[r, s, :, (2i+j)F + f] = k3[r-i, s-j, :, f] for
    r-i in 0..2, s-j in 0..2, else zero."""
    kh, kw, c, f = k3.shape
    assert (kh, kw) == (3, 3)
    k4 = jnp.zeros((4, 4, c, 4 * f), k3.dtype)
    for i in range(2):
        for j in range(2):
            ph = 2 * i + j
            k4 = k4.at[i : i + 3, j : j + 3, :, ph * f : (ph + 1) * f].set(k3)
    return k4


def conv64_phase(x, k4):
    """Phase-domain equivalent of conv(x, k3, stride=1, pad=1) for even H, W:
    stride-2 4x4 conv with padding ((1,2),(1,2)) then depth_to_space."""
    y = jax.lax.conv_general_dilated(
        x, k4, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=DIMSPEC, precision=jax.lax.Precision.HIGHEST)
    return depth_to_space2(y)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    B = args.batch
    rng = np.random.default_rng(0)

    # -- exactness of the phase reformulation (f32, even-size input) --------
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 64)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    ref = conv(x, k3)
    got = conv64_phase(x, phase_kernel_4x4(k3))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"phase-conv exactness (f32): max|delta| = {err:.3e}")
    assert err < 1e-4, err

    # -- where encoder forward time goes: every conv shape at B ------------
    print(f"\n== encoder conv shapes, B={B}, {args.dtype} ==")
    shapes = [
        ("stem 7x7/2 3->64 @450x800", (450, 800, 3), (7, 7, 3, 64), 2, 3),
        ("layer1 3x3 64->64 @113x200", (113, 200, 64), (3, 3, 64, 64), 1, 1),
        ("layer2a 3x3/2 64->128 @113x200", (113, 200, 64), (3, 3, 64, 128), 2, 1),
        ("layer2 3x3 128->128 @57x100", (57, 100, 128), (3, 3, 128, 128), 1, 1),
        ("layer3 3x3 256->256 @29x50", (29, 50, 256), (3, 3, 256, 256), 1, 1),
        ("layer4 3x3 512->512 @15x25", (15, 25, 512), (3, 3, 512, 512), 1, 1),
    ]
    for label, xshape, kshape, stride, pad in shapes:
        xb = jnp.asarray(
            rng.standard_normal((B,) + xshape).astype(np.float32), dtype)
        kb = jnp.asarray(
            (rng.standard_normal(kshape) * 0.05).astype(np.float32), dtype)

        def f(carry, xb, kb, stride=stride, pad=pad):
            y = conv(xb + carry.astype(dtype) * 1e-30, kb, stride, pad)
            return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

        timeit(f, (xb, kb), label=label)

    # -- layer1 conv: direct vs phase-domain -------------------------------
    print(f"\n== layer1 candidate, B={B}, {args.dtype} (114x200 even-pad) ==")
    xb = jnp.asarray(
        rng.standard_normal((B, 114, 200, 64)).astype(np.float32), dtype)
    k3b = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.05)
                      .astype(np.float32), dtype)
    k4b = phase_kernel_4x4(k3b)

    def direct(carry, xb, kb):
        y = conv(xb + carry.astype(dtype) * 1e-30, kb)
        return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

    def phase(carry, xb, kb):
        y = conv64_phase(xb + carry.astype(dtype) * 1e-30, kb)
        return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

    def phase_no_d2s(carry, xb, kb):
        y = jax.lax.conv_general_dilated(
            xb + carry.astype(dtype) * 1e-30, kb, window_strides=(2, 2),
            padding=((1, 2), (1, 2)), dimension_numbers=DIMSPEC,
            precision=jax.lax.Precision.HIGHEST)
        return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

    timeit(direct, (xb, k3b), label="direct 3x3 64->64")
    timeit(phase_no_d2s, (xb, k4b), label="phase 4x4/2 64->256 (no d2s)")
    timeit(phase, (xb, k4b), label="phase 4x4/2 64->256 + d2s")

    # chained pair (conv -> relu -> conv), both forms, to include layout
    # effects between consecutive convs
    k3c = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.05)
                      .astype(np.float32), dtype)
    k4c = phase_kernel_4x4(k3c)

    def direct_pair(carry, xb, ka, kb):
        y = conv(xb + carry.astype(dtype) * 1e-30, ka)
        y = jax.nn.relu(y)
        y = conv(y, kb)
        return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

    def phase_pair(carry, xb, ka, kb):
        y = conv64_phase(xb + carry.astype(dtype) * 1e-30, ka)
        y = jax.nn.relu(y)
        y = conv64_phase(y, kb)
        return carry + jnp.sum(y[0, 0, 0].astype(jnp.float32))

    timeit(direct_pair, (xb, k3b, k3c), label="direct pair (2x conv+relu)")
    timeit(phase_pair, (xb, k4b, k4c), label="phase pair (2x conv+relu)")


if __name__ == "__main__":
    main()
