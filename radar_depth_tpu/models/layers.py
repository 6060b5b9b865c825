"""Low-level layers with exact torch-semantics where parity demands it.

The reference model zoo (upstream:models.py — sparse-to-dense skeleton reused
by radar_depth; SURVEY.md §2 C7) is built from torch Conv2d / ConvTranspose2d /
MaxPool2d / BatchNorm2d / bilinear Upsample. This module provides NHWC
(TPU-native layout) equivalents whose numerics match torch exactly so weight
conversion + parity tests work (SURVEY.md §7 hard parts #3/#4).

Key TPU-first choice: zero-insertion "unpool → conv" stacks (UpConv/UpProj
blocks) are implemented as a single `lax.conv_general_dilated` with
``lhs_dilation=2`` — the zeros are never materialized, XLA maps it straight
onto the MXU. An explicit `unpool` is kept only as a test oracle.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# NHWC activations, HWIO kernels — the native TPU conv layout.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def unpool_zero_insert(x: jax.Array, stride: int = 2) -> jax.Array:
    """Reference-oracle unpool: place x[i, j] at (s*i, s*j), zeros elsewhere.

    Matches upstream:models.py::Unpool (a stride-s zero-insertion implemented
    there as a grouped conv with a one-hot kernel). Output is (N, s*H, s*W, C).
    Only used in tests — production paths fuse this into the following conv via
    lhs_dilation (see fused_unpool_conv).
    """
    n, h, w, c = x.shape
    out = jnp.zeros((n, h, stride, w, stride, c), x.dtype)
    out = out.at[:, :, 0, :, 0, :].set(x)
    return out.reshape(n, h * stride, w * stride, c)


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    lhs_dilation: Sequence[int] | None = None,
) -> jax.Array:
    """Plain NHWC conv with torch-style symmetric integer padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=DIMSPEC,
        precision=jax.lax.Precision.HIGHEST,
    )


def fused_unpool_conv_padding(kernel_size: int, stride: int = 2) -> tuple:
    """Padding that makes conv(lhs_dilation=s)(x) == conv_pad_k//2(unpool_s(x)).

    Zero-insertion unpool produces size s*H with the last (s-1) rows zero;
    input dilation produces (H-1)*s + 1. Appending (s-1) extra zeros on the
    bottom/right of the dilated input reproduces the unpooled array exactly, so
    pad = (k//2, k//2 + s - 1).
    """
    p = kernel_size // 2
    return ((p, p + stride - 1), (p, p + stride - 1))


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with exact torch semantics (stride/padding/
    output_padding), NHWC.

    torch's transposed conv == conv over the input dilated by `stride`, padded
    by (k-1-p) per side (+output_padding on bottom/right), with the kernel
    spatially flipped. Matches upstream:models.py::DeConv layers
    (ConvTranspose2d(c, c//2, k, stride=2, padding=(k-1)//2,
    output_padding=k%2); SURVEY.md §2 C7b).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        kernel = jnp.flip(kernel, axis=(0, 1)).astype(dtype)
        pad = ((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel,
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(s, s),
            dimension_numbers=DIMSPEC,
        precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
            )
            y = y + bias.astype(dtype)
        return y


def phase_unpool_conv_kernels(kernel: jax.Array) -> jax.Array:
    """Re-express a (5, 5, C, K) unpool-conv kernel as a (3, 3, C, 4K) phase
    kernel for the depth-to-space formulation.

    The stride-2 zero-insertion unpool followed by a 5×5 conv touches, for
    output phase (a, b) ∈ {0,1}², only the kernel taps with matching parity:
      a=0 rows use w[0], w[2], w[4] at input rows m-1, m, m+1
      a=1 rows use  0 , w[1], w[3] at input rows m-1, m, m+1
    (same for columns). So the 2H×2W output is exactly a 3×3 conv at H×W
    producing 4 phase outputs, rearranged by depth_to_space — identical sums,
    4× less spatial extent and 4× more output channels for the MXU
    (SURVEY.md §7 hard part #5: the decoder chain is the bandwidth/utilization
    bottleneck).

    Output channel layout: (a, b, k) → channel ((a*2 + b) * K + k).
    """
    k5 = kernel

    def row_taps(a):
        if a == 0:
            return [k5[0:1], k5[2:3], k5[4:5]]  # rows m-1, m, m+1
        return [jnp.zeros_like(k5[0:1]), k5[1:2], k5[3:4]]

    phases = []
    for a in (0, 1):
        rows = row_taps(a)
        for b in (0, 1):
            taps = []
            for r in rows:  # r: (1, 5, C, K)
                if b == 0:
                    cols = [r[:, 0:1], r[:, 2:3], r[:, 4:5]]
                else:
                    cols = [jnp.zeros_like(r[:, 0:1]), r[:, 1:2], r[:, 3:4]]
                taps.append(jnp.concatenate(cols, axis=1))  # (1, 3, C, K)
            phases.append(jnp.concatenate(taps, axis=0))  # (3, 3, C, K)
    return jnp.concatenate(phases, axis=-1)  # (3, 3, C, 4K)


def depth_to_space2(x: jax.Array) -> jax.Array:
    """(N, H, W, 4K) with channel layout (a, b, k) → (N, 2H, 2W, K)."""
    n, h, w, c4 = x.shape
    k = c4 // 4
    x = x.reshape(n, h, w, 2, 2, k)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # n, h, a, w, b, k
    return x.reshape(n, 2 * h, 2 * w, k)


def _interp_matrix(out_size: int, in_size: int) -> jax.Array:
    """Row-stochastic (out, in) bilinear interpolation matrix, half-pixel
    centers (align_corners=False) with edge clamping — matches
    jax.image.resize / torch F.interpolate semantics."""
    import numpy as np

    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.floor(src).astype(int)
    frac = src - lo
    lo_c = np.clip(lo, 0, in_size - 1)
    hi_c = np.clip(lo + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo_c] += 1.0 - frac
    m[np.arange(out_size), hi_c] += frac
    return jnp.asarray(m)


def resize_bilinear_matmul(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize as two separable matmuls (MXU path): for each channel
    y = R_h · x · R_wᵀ. Numerically equivalent to resize_bilinear; much faster
    on TPU than the gather formulation for small channel counts.

    Runs in the input dtype: for float32 models (parity tests) this is exact
    f32·HIGHEST; for bf16 compute an f32 upcast here costs a multi-pass
    HIGHEST matmul (~1.6 ms/stage at B=128, measured) for ≤4e-3 relative
    difference on an already-bf16 conv output — not worth it."""
    n, h, w, c = x.shape
    rh = _interp_matrix(height, h).astype(x.dtype)
    rw = _interp_matrix(width, w).astype(x.dtype)
    y = jnp.einsum("Hh,nhwc->nHwc", rh, x,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Ww,nhwc->nhWc", rw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def max_pool_torch(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1):
    """MaxPool2d(window, stride, padding) with torch floor-mode semantics —
    upstream torchvision ResNet stem (SURVEY.md §2 C7a).

    (A strided-slices + max-tree variant won a standalone microbench by ~5%
    but regressed the full graph by 17% — reduce_window fuses better in
    context; keep it.)"""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize, half-pixel centers (torch align_corners=False) — the
    final ×2 upsample in upstream:models.py::ResNet.forward (self.bilinear)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")


class HeadConv3(nn.Module):
    """Final 3×3 conv → 1 channel (upstream:models.py head conv). Same param
    tree as the nn.Conv it replaces (<name>/kernel, (3, 3, C, 1)).

    With packed=True the input is the decoder's (H, W, 4C) phase tensor; the
    conv runs with phase-expanded kernels (packed_conv3_kernels) producing
    the 4 output phases at quarter area, and one tiny depth_to_space yields
    the (2H, 2W, 1) map. A direct 16→1 conv at (2H, 2W) ran at 0.65 TF/s
    (127/128 output lanes wasted); this path also avoids materializing the
    (2H, 2W, 16) tensor at all."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        c = x.shape[-1] // 4 if packed else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, 1), jnp.float32)
        if packed:
            from radar_depth_tpu.models.packed import packed_conv3_kernels

            y = conv2d(x.astype(self.dtype),
                       packed_conv3_kernels(kernel).astype(self.dtype),
                       padding=1)
            return depth_to_space2(y)
        return conv2d(x.astype(self.dtype), kernel.astype(self.dtype),
                      padding=1)


def make_norm(momentum: float = 0.9, epsilon: float = 1e-5, dtype: Any = None):
    """BatchNorm factory matching torch BatchNorm2d(momentum=0.1, eps=1e-5):
    flax's `momentum` is the running-average retain factor = 1 - torch momentum
    (SURVEY.md §7 hard part #3).

    `dtype` is the OUTPUT/compute dtype. Without it flax promotes to the f32
    param dtype, so on bf16 models every BN→ReLU boundary wrote float32
    (2× HBM bytes) and converted back to bf16 for the next conv — profiled
    as ~25% of the whole forward pass (`maximum_convert_fusion` ops). Stats
    math stays float32 inside flax either way; f32 models are unchanged."""
    import functools

    return functools.partial(
        nn.BatchNorm, momentum=momentum, epsilon=epsilon,
        param_dtype=jnp.float32, dtype=dtype,
    )
