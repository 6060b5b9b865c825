"""Dataset layer: sample schema (the L1→L2 contract of SURVEY.md §1), the
synthetic nuScenes-like fixture generator (SURVEY.md §7 step 1 — no real
nuScenes exists on this machine and none can be downloaded), and batched host
loaders feeding the on-device preprocessing kernels in `ops/`."""

from radar_depth_tpu.data.schema import Sample, Batch, SampleSpec
from radar_depth_tpu.data.synthetic import SyntheticNuScenes, SceneConfig

__all__ = ["Sample", "Batch", "SampleSpec", "SyntheticNuScenes", "SceneConfig"]
