"""ResNet-18/34/50 encoders (flax linen, NHWC) mirroring the torchvision
backbones the reference builds on (upstream:models.py::ResNet uses
torchvision.models.resnet18/34 layers; SURVEY.md §2 C7a. ResNet-50's
Bottleneck variant comes from the reference's structural parent,
fangchangma/sparse-to-dense.pytorch, whose models.py supports resnet50 —
kept so reference users migrating from either repo find their backbone).

Structure is kept 1:1 with torchvision BasicBlock stacks so that a torch
state_dict converts mechanically (utils/torch_convert.py), including the
reference's early-fusion trick of widening conv1 to in_channels=4 for RGBD
(upstream:models.py — new Conv2d(4, 64, 7, 2, 3) when in_channels != 3).

No skip connections to the decoder: the reference's sparse-to-dense skeleton
is a plain encoder → bottleneck → decoder stack (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from radar_depth_tpu.models.layers import make_norm, max_pool_torch

STAGE_SIZES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
BOTTLENECK_EXPANSION = 4  # torchvision Bottleneck: output = 4 * planes


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + identity/1x1 shortcut."""

    features: int
    stride: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = self.norm or make_norm(dtype=self.dtype)
        y = nn.Conv(
            self.features, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="conv1",
        )(x)
        y = norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="conv2",
        )(y)
        y = norm(name="bn2")(y, use_running_average=not train)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(
                self.features, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="downsample_conv",
            )(x)
            x = norm(name="downsample_bn")(x, use_running_average=not train)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (ResNet V1.5: the stride sits on the 3×3):
    1×1-BN-ReLU → 3×3(s)-BN-ReLU → 1×1(×4)-BN + identity/1×1 shortcut."""

    features: int  # "planes" width of the 3×3; block output is 4×features
    stride: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = self.norm or make_norm(dtype=self.dtype)
        out_features = self.features * BOTTLENECK_EXPANSION
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            precision=jax.lax.Precision.HIGHEST, name="conv1",
        )(x)
        y = norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            precision=jax.lax.Precision.HIGHEST, name="conv2",
        )(y)
        y = norm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(
            out_features, (1, 1), use_bias=False, dtype=self.dtype,
            precision=jax.lax.Precision.HIGHEST, name="conv3",
        )(y)
        y = norm(name="bn3")(y, use_running_average=not train)
        if x.shape[-1] != out_features or self.stride != 1:
            x = nn.Conv(
                out_features, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
                precision=jax.lax.Precision.HIGHEST, name="downsample_conv",
            )(x)
            x = norm(name="downsample_bn")(x, use_running_average=not train)
        return nn.relu(y + x)


class StemConv(nn.Module):
    """7×7 stride-2 stem conv with the kernel as an eagerly-declared param so
    sibling encoders can read it for cross-encoder output-concat fusion
    (MultiStageNet/LateFusionNet stem sharing). Param tree identical to the
    nn.Conv it replaces: <name>/kernel, (7, 7, C, width), lecun-normal."""

    features: int
    in_channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, self.in_channels, self.features), jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)


class ResNetEncoder(nn.Module):
    """conv1 → bn → relu → maxpool → layer1..layer4. Returns the (H/32)
    bottleneck feature map (512 channels for ResNet-18/34, 2048 for
    ResNet-50).

    The stem is split into addressable pieces (stem_conv / stem_finish /
    body) so fusion wrappers can batch independent stems through one conv
    and one maxpool (lane-utilization win on TPU: a 64-channel stem wastes
    half the VPU/MXU lanes; three concatenated stems fill 192). All pieces
    compose to exactly the original math."""

    depth: int = 18  # 18, 34 (BasicBlock) or 50 (Bottleneck)
    in_channels: int = 3
    width: int = 64
    norm: Callable = None
    dtype: Any = jnp.float32

    def setup(self):
        norm = self.norm or make_norm(dtype=self.dtype)
        self.conv1 = StemConv(self.width, self.in_channels, dtype=self.dtype,
                              name="conv1")
        self.bn1 = norm(name="bn1")
        block_cls = Bottleneck if self.depth >= 50 else BasicBlock
        blocks = []
        for stage, num_blocks in enumerate(STAGE_SIZES[self.depth]):
            features = self.width * (2**stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                blocks.append(block_cls(
                    features, stride=stride, norm=norm, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}"))
        self.blocks = blocks

    def stem_conv(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)
        return self.conv1(x)

    def stem_finish(self, y: jax.Array, train: bool) -> jax.Array:
        """BN + ReLU on the stem conv output (pre-pool)."""
        return nn.relu(self.bn1(y, use_running_average=not train))

    def body(self, p: jax.Array, train: bool) -> jax.Array:
        """layer1..layer4 on the pooled stem output."""
        y = p
        for blk in self.blocks:
            y = blk(y, train)
        return y

    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = self.stem_finish(self.stem_conv(x), train)
        return self.body(max_pool_torch(y, 3, 2, 1), train)

    @property
    def out_channels(self) -> int:
        exp = BOTTLENECK_EXPANSION if self.depth >= 50 else 1
        return self.width * 8 * exp
