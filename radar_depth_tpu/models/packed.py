"""Packed-space (phase-domain) UpProj machinery.

Motivation (NOTES.md): on TPU, tensors with <128 channels are lane-padded, so
the decoder tail's (2H, 2W, 16..64)-channel convs and BNs run at 3-5 TFLOP/s
and waste HBM bandwidth. This module evaluates an ENTIRE UpProj block in the
stride-2 phase domain: activations stay at (H, W, 4K) — 4× fewer pixels, 4×
more channels — and depth_to_space runs once per block instead of the three
(2H, 2W, K) materializations of the direct formulation.

All transforms are exact re-associations of the same dot products:

* unpool+5×5 conv → 3×3 conv to 4K phase channels (layers.
  phase_unpool_conv_kernels), NO depth_to_space.
* logical 3×3 conv at (2H, 2W, K→K) → packed 3×3 conv at (H, W, 4K→4K) with a
  block-structured kernel: output phase (a, b) pulls logical tap (ju, jv)
  from input phase c = (a+ju−1) mod 2 at packed offset ⌊(a+ju−1)/2⌋ (same for
  columns). 4× the nominal FLOPs (zero blocks are materialized) but every
  dimension is MXU-lane friendly.
* logical BatchNorm over (N, 2H, 2W) per channel k → packed BN pooling over
  (N, H, W, phase): identical statistics, identical (K,) parameter and
  running-stat shapes.

The parameter tree of PackedUpProjBlock is IDENTICAL (names and shapes) to
decoders.UpProjBlock, so checkpoints and the torch converter are unaffected.
Equivalence is asserted in tests/test_packed_upproj.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from radar_depth_tpu.models.layers import (
    DIMSPEC,
    depth_to_space2,
    phase_unpool_conv_kernels,
)


def packed_conv3_kernels(w3: jax.Array) -> jax.Array:
    """(3, 3, K, K) logical kernel → (3, 3, 4K, 4K) packed-phase kernel.

    Channel layout on both sides: packed channel (p, k) = p*K + k with
    p = phase_row*2 + phase_col, matching depth_to_space2."""
    zeros = jnp.zeros_like(w3[0, 0])  # (K, K)

    def tap(a, c, Ju):
        """Logical tap index ju for output phase a, input phase c at packed
        kernel position Ju (packed offset Ju−1); None if outside the 3-tap
        window."""
        ju = 2 * (Ju - 1) + c - a + 1
        return ju if 0 <= ju < 3 else None

    rows = []
    for Ju in range(3):
        cols = []
        for Jv in range(3):
            in_blocks = []
            for c in range(2):
                for d in range(2):
                    out_blocks = []
                    for a in range(2):
                        for b in range(2):
                            ju = tap(a, c, Ju)
                            jv = tap(b, d, Jv)
                            out_blocks.append(
                                w3[ju, jv]
                                if ju is not None and jv is not None
                                else zeros
                            )
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))  # (4K, 4K)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # (3, 3, 4K, 4K)


def _conv(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=DIMSPEC, precision=jax.lax.Precision.HIGHEST,
    )


class _PhaseUnpoolConv(nn.Module):
    """unpool+5×5 conv in phase space: (H, W, C) → (H, W, 4K), no d2s.
    Param 'kernel' (5,5,C,K) — same as decoders._UnpoolConv."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (5, 5, x.shape[-1], self.features), jnp.float32)
        return _conv(x, phase_unpool_conv_kernels(kernel), self.dtype)


class _PackedConv3(nn.Module):
    """Logical 3×3 conv on phase-packed input: (H, W, 4K) → (H, W, 4K).
    Param 'kernel' (3,3,K,K) — same as nn.Conv(K, (3,3))."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.features
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, k, k), jnp.float32)
        return _conv(x, packed_conv3_kernels(kernel), self.dtype)


class PackedBatchNorm(nn.Module):
    """BatchNorm over logical channels while activations live in phase space.

    Input (N, H, W, 4K); statistics pool over (N, H, W, phase) per logical
    channel k — numerically identical to nn.BatchNorm on the (N, 2H, 2W, K)
    logical tensor. Variable shapes/names match nn.BatchNorm((K,))."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        k = x.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones_init(), (k,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (k,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((k,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((k,), jnp.float32))

        xp = x.reshape(x.shape[:-1] + (4, k))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(xp.ndim - 1))  # all but logical channel
            xf = xp.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            # nn.BatchNorm normalizes with the biased variance E[x²]−E[x]²
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xp - mean.astype(xp.dtype)) * inv.astype(xp.dtype) \
            + bias.astype(xp.dtype)
        return y.reshape(x.shape)


class PackedUpProjBlock(nn.Module):
    """decoders.UpProjBlock, evaluated end-to-end in phase space with one
    depth_to_space at the output. Same parameter tree (names/shapes).

    With emit_packed=True the final depth_to_space is skipped and the block
    returns the (H, W, 4K) phase tensor — the packed-tail path lets the 3×3
    head conv consume phases directly, so the awkward (2H, 2W, K<128) tensor
    (whose layout copy alone profiled at ~5.6 ms/stage at B=128) is never
    materialized."""

    features: int
    norm: Callable = None  # accepted for API parity; BN here must pool phases
    dtype: Any = jnp.float32
    emit_packed: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        k = self.features
        ra = not train
        b1 = _PhaseUnpoolConv(k, dtype=self.dtype, name="branch1_conv1")(x)
        b1 = PackedBatchNorm(name="branch1_bn1")(b1, use_running_average=ra)
        b1 = nn.relu(b1)
        b1 = _PackedConv3(k, dtype=self.dtype, name="branch1_conv2")(b1)
        b1 = PackedBatchNorm(name="branch1_bn2")(b1, use_running_average=ra)
        b2 = _PhaseUnpoolConv(k, dtype=self.dtype, name="branch2_conv")(x)
        b2 = PackedBatchNorm(name="branch2_bn")(b2, use_running_average=ra)
        y = nn.relu(b1 + b2)
        return y if self.emit_packed else depth_to_space2(y)
