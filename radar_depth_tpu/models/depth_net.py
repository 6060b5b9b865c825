"""Single-branch sparse-to-dense depth network (RGB / RGBD-early-fusion / D).

upstream:models.py::ResNet forward (SURVEY.md §3.4 stage internals):
  conv1(7×7,s2) → bn → relu → maxpool → layer1..4 → 1×1 bottleneck conv → bn
  → decoder (4 up-blocks) → 3×3 conv → 1ch → bilinear ×2 to output size.

Early fusion = in_channels 4 (RGB + sparse radar/depth channel), matching the
reference's widened conv1. The whole forward is one jittable function; inputs
NHWC, output (N, H, W, 1).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from radar_depth_tpu.models.decoders import Decoder, tail_packed_enabled
from radar_depth_tpu.models.layers import (
    HeadConv3,
    make_norm,
    resize_bilinear_matmul,
)
from radar_depth_tpu.models.resnet import ResNetEncoder


class DepthNet(nn.Module):
    """Encoder–decoder monocular/sparse-depth network."""

    depth: int = 18
    in_channels: int = 3
    decoder_kind: str = "upproj"
    output_size: tuple = (450, 800)
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm or make_norm(dtype=self.dtype)
        enc = ResNetEncoder(
            depth=self.depth, in_channels=self.in_channels,
            norm=norm, dtype=self.dtype, name="encoder",
        )
        y = enc(x, train)
        c = enc.out_channels  # 512
        y = nn.Conv(c // 2, (1, 1), use_bias=False, dtype=self.dtype, precision=jax.lax.Precision.HIGHEST, name="conv2")(y)
        y = norm(name="bn2")(y, use_running_average=not train)
        y = Decoder(
            kind=self.decoder_kind, in_channels=c // 2,
            norm=norm, dtype=self.dtype, name="decoder",
        )(y, train)
        y = HeadConv3(dtype=self.dtype, name="conv3")(
            y, packed=tail_packed_enabled(self.decoder_kind))
        y = resize_bilinear_matmul(y, *self.output_size)
        return y.astype(jnp.float32)
