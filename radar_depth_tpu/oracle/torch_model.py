"""torch (CPU) re-implementation of the model zoo for parity testing.

Written from SURVEY.md §3.4's architecture description (upstream:models.py
design): torchvision-style ResNet-18/34 BasicBlock (and ResNet-50
Bottleneck, per the sparse-to-dense.pytorch parent) encoder, 1×1 bottleneck,
{DeConv, UpConv, UpProj} decoders with zero-insertion Unpool, early/late
fusion, two-stage coarse→refine with radar filtering. NCHW, float32.

Attribute names mirror radar_depth_tpu.models' flax tree (encoder.layer1_0.
conv1 ↔ params['encoder']['layer1_0']['conv1']) so torch_convert can map
state_dicts without a lookup table.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

STAGE_SIZES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
BOTTLENECK_EXPANSION = 4


def conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride, 1, bias=False)


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = conv3x3(cin, cout, stride)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = conv3x3(cout, cout)
        self.bn2 = nn.BatchNorm2d(cout)
        self.has_downsample = stride != 1 or cin != cout
        if self.has_downsample:
            self.downsample_conv = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.downsample_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.has_downsample:
            x = self.downsample_bn(self.downsample_conv(x))
        return F.relu(y + x)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (ResNet V1.5: stride on the 3×3), mirroring
    models.resnet.Bottleneck — 1×1 → 3×3(s) → 1×1(×4) + shortcut."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * BOTTLENECK_EXPANSION
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.has_downsample = stride != 1 or cin != cout
        if self.has_downsample:
            self.downsample_conv = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.downsample_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.has_downsample:
            x = self.downsample_bn(self.downsample_conv(x))
        return F.relu(y + x)


class Encoder(nn.Module):
    def __init__(self, depth=18, in_channels=3, width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        expansion = BOTTLENECK_EXPANSION if depth >= 50 else 1
        cin = width
        for stage, blocks in enumerate(STAGE_SIZES[depth]):
            planes = width * (2**stage)
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                if depth >= 50:
                    blk = Bottleneck(cin, planes, stride)
                    cin = planes * expansion
                else:
                    blk = BasicBlock(cin, planes, stride)
                    cin = planes
                setattr(self, f"layer{stage + 1}_{b}", blk)
        self.depth = depth
        self.out_channels = width * 8 * expansion

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.max_pool2d(y, 3, 2, 1)
        for stage, blocks in enumerate(STAGE_SIZES[self.depth]):
            for b in range(blocks):
                y = getattr(self, f"layer{stage + 1}_{b}")(y)
        return y


def unpool(x):
    """Zero-insertion stride-2 unpool (upstream:models.py::Unpool)."""
    n, c, h, w = x.shape
    out = x.new_zeros(n, c, h, 2, w, 2)
    out[:, :, :, 0, :, 0] = x
    return out.reshape(n, c, h * 2, w * 2)


class DeConvBlock(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.convt = nn.ConvTranspose2d(cin, cout, k, 2, (k - 1) // 2,
                                        output_padding=k % 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.convt(x)))


class UpConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(unpool(x))))


class UpProjBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.branch1_conv1 = nn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.branch1_bn1 = nn.BatchNorm2d(cout)
        self.branch1_conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.branch1_bn2 = nn.BatchNorm2d(cout)
        self.branch2_conv = nn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.branch2_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        u = unpool(x)
        b1 = self.branch1_bn2(self.branch1_conv2(
            F.relu(self.branch1_bn1(self.branch1_conv1(u)))))
        b2 = self.branch2_bn(self.branch2_conv(u))
        return F.relu(b1 + b2)


class Decoder(nn.Module):
    def __init__(self, kind, in_channels, num_layers=4):
        super().__init__()
        c = in_channels
        for i in range(num_layers):
            cout = c // 2
            if kind == "deconv2":
                blk = DeConvBlock(c, cout, 2)
            elif kind == "deconv3":
                blk = DeConvBlock(c, cout, 3)
            elif kind == "upconv":
                blk = UpConvBlock(c, cout)
            elif kind == "upproj":
                blk = UpProjBlock(c, cout)
            else:
                raise ValueError(kind)
            setattr(self, f"layer{i + 1}", blk)
            c = cout
        self.num_layers = num_layers

    def forward(self, x):
        for i in range(self.num_layers):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


class TorchDepthNet(nn.Module):
    """Oracle of models.depth_net.DepthNet."""

    def __init__(self, depth=18, in_channels=3, decoder="upproj",
                 output_size=(450, 800)):
        super().__init__()
        self.encoder = Encoder(depth, in_channels)
        c = self.encoder.out_channels
        self.conv2 = nn.Conv2d(c, c // 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c // 2)
        self.decoder = Decoder(decoder, c // 2)
        self.conv3 = nn.Conv2d(c // 32, 1, 3, 1, 1, bias=False)
        self.output_size = tuple(output_size)

    def forward(self, x):
        y = self.bn2(self.conv2(self.encoder(x)))
        y = self.conv3(self.decoder(y))
        return F.interpolate(y, size=self.output_size, mode="bilinear",
                             align_corners=False)


class TorchLateFusionNet(nn.Module):
    """Oracle of models.fusion.LateFusionNet."""

    def __init__(self, depth=18, decoder="upproj", output_size=(450, 800),
                 radar_width=64, radar_in_channels=1):
        super().__init__()
        self.img_encoder = Encoder(depth, 3)
        self.radar_encoder = Encoder(depth, radar_in_channels, radar_width)
        c = self.img_encoder.out_channels
        self.conv2 = nn.Conv2d(c + self.radar_encoder.out_channels, c // 2,
                               1, bias=False)
        self.bn2 = nn.BatchNorm2d(c // 2)
        self.decoder = Decoder(decoder, c // 2)
        self.conv3 = nn.Conv2d(c // 32, 1, 3, 1, 1, bias=False)
        self.output_size = tuple(output_size)

    def forward(self, rgb, radar):
        f = torch.cat([self.img_encoder(rgb), self.radar_encoder(radar)], dim=1)
        y = self.bn2(self.conv2(f))
        y = self.conv3(self.decoder(y))
        return F.interpolate(y, size=self.output_size, mode="bilinear",
                             align_corners=False)


class TorchMultiStageNet(nn.Module):
    """Oracle of models.fusion.MultiStageNet (abs-threshold filter)."""

    def __init__(self, depth=18, decoder="upproj", output_size=(450, 800),
                 abs_threshold=2.0, stage2_coarse=False):
        super().__init__()
        self.stage1 = TorchLateFusionNet(depth, decoder, output_size)
        self.stage2 = TorchLateFusionNet(
            depth, decoder, output_size,
            radar_in_channels=2 if stage2_coarse else 1)
        self.abs_threshold = abs_threshold
        self.stage2_coarse = stage2_coarse

    def forward(self, rgb, radar):
        coarse = self.stage1(rgb, radar)
        keep = (radar > 0) & ((radar - coarse.detach()).abs() < self.abs_threshold)
        filtered = torch.where(keep, radar, torch.zeros_like(radar))
        if self.stage2_coarse:
            # mirrors models/fusion.py MultiStageNet(stage2_coarse=True):
            # D1 rides as the second radar-branch channel, detached
            filtered = torch.cat([filtered, coarse.detach()], dim=1)
        refined = self.stage2(rgb, filtered)
        return coarse, refined
