"""ResNet-18/34 encoders (flax linen, NHWC) mirroring the torchvision
backbones the reference builds on (upstream:models.py::ResNet uses
torchvision.models.resnet18/34 layers; SURVEY.md §2 C7a).

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

STAGE_SIZES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + identity/1x1 shortcut."""

    features: int
    stride: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = self.norm or make_norm()
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


class ResNetEncoder(nn.Module):
    """conv1 → bn → relu → maxpool → layer1..layer4. Returns the (H/32)
    bottleneck feature map (512 channels for ResNet-18/34)."""

    depth: int = 18  # 18 or 34
    in_channels: int = 3
    width: int = 64
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)
        norm = self.norm or make_norm()
        y = nn.Conv(
            self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="conv1",
        )(x)
        y = norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = max_pool_torch(y, 3, 2, 1)
        for stage, num_blocks in enumerate(STAGE_SIZES[self.depth]):
            features = self.width * (2**stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                y = BasicBlock(
                    features,
                    stride=stride,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(y, train)
        return y

    @property
    def out_channels(self) -> int:
        return self.width * 8
