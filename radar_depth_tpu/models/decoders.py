"""Decoder variants: DeConv / UpConv / UpProj (+ the Unpool op), NHWC.

Re-design of upstream:models.py::{DeConv, UpConv, UpProj, Unpool,
choose_decoder} (SURVEY.md §2 C7b/c): four up-blocks, each doubling spatial
resolution and halving channels (256 → 128 → 64 → 32 → 16 after the 1×1
bottleneck conv of a ResNet-18/34).

TPU-first: UpConv/UpProj's "unpool(zero-insert) then KxK conv" is compiled as
ONE input-dilated convolution (lhs_dilation=2) — the sparse zero-inserted
tensor never exists in memory, halving HBM traffic for the bandwidth-bound
decoder chain (SURVEY.md §7 hard part #5). Equivalence with the explicit
unpool oracle is asserted in tests/test_decoders.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

import os

from radar_depth_tpu.models.layers import (
    DIMSPEC,
    TorchConvTranspose,
    depth_to_space2,
    fused_unpool_conv_padding,
    make_norm,
    phase_unpool_conv_kernels,
)

# Default unpool-conv implementation ("dilated" | "phase"), overridable via
# env for benchmarking. Both are numerically identical (tested); which is
# faster depends on the XLA version/backend — measured on the current axon
# v5e relay: dilated wins in-graph, so it is the default.
DEFAULT_UNPOOL_IMPL = os.environ.get("RDT_UNPOOL_IMPL", "dilated")

# Whole-block phase-domain UpProj (models/packed.py): all three convs + BNs of
# a block run at (H, W, 4K) with one depth_to_space at the end — numerically
# identical, avoids lane-padded high-res tensors. Toggle for benchmarking.
UPPROJ_PACKED = os.environ.get("RDT_UPPROJ_PACKED", "0") == "1"


def tail_packed_enabled(kind: str) -> bool:
    """Packed-tail path (default on for upproj): the LAST decoder block stays
    in phase space and the 3×3 head conv consumes phases directly — the
    (2H, 2W, 16) tensor whose XLA layout copy profiled at ~5.6 ms/stage at
    B=128 never exists. Exact reassociation (tests/test_packed_upproj.py).
    Disable with RDT_TAIL_PACKED=0."""
    return kind == "upproj" and os.environ.get("RDT_TAIL_PACKED", "1") == "1"


class _UnpoolConv(nn.Module):
    """Fused unpool(stride 2) + KxK conv, the building block of UpConv/UpProj.

    Numerically identical to conv_pad[k//2](unpool_2(x)) with torch-style
    symmetric padding. Two implementations (same sums, reassociated):

      impl="phase"   (default, k=5 only): 3×3 conv at H×W producing 4K phase
                     channels + depth_to_space → 2H×2W×K. 4× smaller spatial
                     extent, 4× more MXU lanes — the fast path for the
                     low-channel decoder tail.
      impl="dilated" lax conv with lhs_dilation=2 (also zero-free; used as
                     the equivalence oracle and for k≠5).
    """

    features: int
    kernel_size: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    impl: str = DEFAULT_UNPOOL_IMPL

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        if self.impl == "phase" and k == 5:
            pk = phase_unpool_conv_kernels(kernel)  # (3, 3, C, 4K)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                pk.astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=DIMSPEC,
                precision=jax.lax.Precision.HIGHEST,
            )
            y = depth_to_space2(y)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding=fused_unpool_conv_padding(k, 2),
                lhs_dilation=(2, 2),
                dimension_numbers=DIMSPEC,
                precision=jax.lax.Precision.HIGHEST,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class DeConvBlock(nn.Module):
    """ConvTranspose2d(c→c/2, k, stride 2) → BN → ReLU.

    upstream:models.py::DeConv with kernel_size ∈ {2, 3} ("deconv2"/"deconv3"):
    padding=(k-1)//2, output_padding=k%2 so spatial size exactly doubles."""

    features: int
    kernel_size: int
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        k = self.kernel_size
        norm = self.norm or make_norm(dtype=self.dtype)
        y = TorchConvTranspose(
            self.features, k, stride=2, padding=(k - 1) // 2,
            output_padding=k % 2, use_bias=False, dtype=self.dtype, name="convt",
        )(x)
        y = norm(name="bn")(y, use_running_average=not train)
        return nn.relu(y)


class UpConvBlock(nn.Module):
    """unpool → 5×5 conv → BN → ReLU (upstream:models.py::UpConv), fused."""

    features: int
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = self.norm or make_norm(dtype=self.dtype)
        y = _UnpoolConv(self.features, 5, dtype=self.dtype, name="conv")(x)
        y = norm(name="bn")(y, use_running_average=not train)
        return nn.relu(y)


class UpProjBlock(nn.Module):
    """Laina-style up-projection (upstream:models.py::UpProj): unpool, then
    residual dual branch {5×5-BN-ReLU-3×3-BN} + {5×5-BN}, add, ReLU. Both
    branches read the same unpooled tensor; we fuse the unpool into each
    branch's first conv."""

    features: int
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = self.norm or make_norm(dtype=self.dtype)
        ra = not train
        b1 = _UnpoolConv(self.features, 5, dtype=self.dtype, name="branch1_conv1")(x)
        b1 = norm(name="branch1_bn1")(b1, use_running_average=ra)
        b1 = nn.relu(b1)
        b1 = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="branch1_conv2",
        )(b1)
        b1 = norm(name="branch1_bn2")(b1, use_running_average=ra)
        b2 = _UnpoolConv(self.features, 5, dtype=self.dtype, name="branch2_conv")(x)
        b2 = norm(name="branch2_bn")(b2, use_running_average=ra)
        return nn.relu(b1 + b2)


class Decoder(nn.Module):
    """Four up-blocks, halving channels each time (upstream:models.py::
    choose_decoder). kind ∈ {deconv2, deconv3, upconv, upproj}."""

    kind: str = "upproj"
    in_channels: int = 256
    num_layers: int = 4
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        assert x.shape[-1] == self.in_channels
        features = self.in_channels
        packed_tail = tail_packed_enabled(self.kind)
        for i in range(self.num_layers):
            features //= 2
            last = i == self.num_layers - 1
            kwargs = dict(norm=self.norm, dtype=self.dtype, name=f"layer{i + 1}")
            if self.kind == "deconv2":
                x = DeConvBlock(features, 2, **kwargs)(x, train)
            elif self.kind == "deconv3":
                x = DeConvBlock(features, 3, **kwargs)(x, train)
            elif self.kind == "upconv":
                x = UpConvBlock(features, **kwargs)(x, train)
            elif self.kind == "upproj":
                if UPPROJ_PACKED or (packed_tail and last):
                    from radar_depth_tpu.models.packed import PackedUpProjBlock

                    x = PackedUpProjBlock(
                        features, emit_packed=packed_tail and last, **kwargs
                    )(x, train)
                else:
                    x = UpProjBlock(features, **kwargs)(x, train)
            else:
                raise ValueError(f"unknown decoder kind {self.kind!r}")
        # When packed_tail: x is the LAST block's (H, W, 4K) phase tensor;
        # consumers (HeadConv3) must be called with packed=True.
        return x


DECODER_KINDS = ("deconv2", "deconv3", "upconv", "upproj")
