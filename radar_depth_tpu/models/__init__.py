"""Model zoo + arch registry (upstream:models.py registry strings; SURVEY.md
§2 C7 and §5 config flags).

Registry names mirror the reference's --arch/--modality semantics:
  resnet18 / resnet34 / resnet50       single branch; channels from --modality
                                       (rgb=3, rgbd=4 early fusion, d=1)
  resnet18_latefusion / resnet34_...   two-branch late fusion (rgb + radar)
  resnet18_multistage / resnet34_...   two-stage coarse→refine

resnet50 (Bottleneck) comes from the reference's structural parent
fangchangma/sparse-to-dense.pytorch (its models.py ships resnet50); the
latefusion/multistage resnet50 combinations extend radar_depth's own pairs
to that backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from radar_depth_tpu.models.decoders import DECODER_KINDS, Decoder
from radar_depth_tpu.models.depth_net import DepthNet
from radar_depth_tpu.models.fusion import (
    LateFusionNet,
    MultiStageNet,
    filter_radar_by_prediction,
)
from radar_depth_tpu.models.resnet import ResNetEncoder

MODALITY_CHANNELS = {"rgb": 3, "rgbd": 4, "d": 1}


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    """How to build and feed a registered architecture."""

    name: str
    input_kind: str  # "single" (one NHWC tensor) | "late" (rgb, radar)
    multistage: bool
    build: Callable[..., Any]


def _single(depth):
    def build(modality="rgbd", decoder="upproj", output_size=(450, 800), dtype=None, **kw):
        import jax.numpy as jnp

        return DepthNet(
            depth=depth,
            in_channels=MODALITY_CHANNELS[modality],
            decoder_kind=decoder,
            output_size=tuple(output_size),
            dtype=dtype or jnp.float32,
            **kw,
        )

    return build


def _late(depth):
    def build(decoder="upproj", output_size=(450, 800), dtype=None, **kw):
        import jax.numpy as jnp

        kw.pop("modality", None)
        return LateFusionNet(
            depth=depth, decoder_kind=decoder, output_size=tuple(output_size),
            dtype=dtype or jnp.float32, **kw,
        )

    return build


def _multi(depth, uncertainty=False):
    def build(decoder="upproj", output_size=(450, 800), dtype=None,
              remat=False, **kw):
        import jax.numpy as jnp

        kw.pop("modality", None)
        return MultiStageNet(
            depth=depth, decoder_kind=decoder, output_size=tuple(output_size),
            dtype=dtype or jnp.float32, remat=remat, uncertainty=uncertainty,
            **kw,
        )

    return build


ARCH_REGISTRY = {
    "resnet18": ArchSpec("resnet18", "single", False, _single(18)),
    "resnet34": ArchSpec("resnet34", "single", False, _single(34)),
    "resnet50": ArchSpec("resnet50", "single", False, _single(50)),
    "resnet18_latefusion": ArchSpec("resnet18_latefusion", "late", False, _late(18)),
    "resnet34_latefusion": ArchSpec("resnet34_latefusion", "late", False, _late(34)),
    "resnet50_latefusion": ArchSpec("resnet50_latefusion", "late", False, _late(50)),
    "resnet18_multistage": ArchSpec("resnet18_multistage", "late", True, _multi(18)),
    "resnet34_multistage": ArchSpec("resnet34_multistage", "late", True, _multi(34)),
    "resnet50_multistage": ArchSpec("resnet50_multistage", "late", True, _multi(50)),
    # SPECULATIVE registry entries (SURVEY.md §2 C7 note [M]: reference may
    # ship *_multistage_uncertainty*): learned per-stage log-variance loss
    # weighting. Also reachable via --multistage-uncertainty.
    "resnet18_multistage_uncertainty": ArchSpec(
        "resnet18_multistage_uncertainty", "late", True,
        _multi(18, uncertainty=True)),
    "resnet34_multistage_uncertainty": ArchSpec(
        "resnet34_multistage_uncertainty", "late", True,
        _multi(34, uncertainty=True)),
}


def create_model(arch: str, **kwargs):
    """Build a model by registry name. Returns (module, spec)."""
    if arch not in ARCH_REGISTRY:
        raise KeyError(f"unknown arch {arch!r}; have {sorted(ARCH_REGISTRY)}")
    spec = ARCH_REGISTRY[arch]
    return spec.build(**kwargs), spec


__all__ = [
    "ARCH_REGISTRY",
    "ArchSpec",
    "create_model",
    "DepthNet",
    "LateFusionNet",
    "MultiStageNet",
    "ResNetEncoder",
    "Decoder",
    "DECODER_KINDS",
    "MODALITY_CHANNELS",
    "filter_radar_by_prediction",
]
