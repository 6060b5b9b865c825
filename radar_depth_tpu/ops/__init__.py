"""Batched, jittable geometry + rasterization ops.

These replace the reference's offline per-sample NumPy preprocessing
(upstream:scripts/* — multi-sweep radar accumulation, ego-motion compensation,
camera projection, sparse-depth rasterization; see SURVEY.md §3.3) with fused
on-device XLA/Pallas kernels operating on padded, masked point buffers.
"""

from radar_depth_tpu.ops.geometry import (
    quat_to_rot,
    se3_from_rot_trans,
    se3_from_quat_trans,
    se3_inverse,
    se3_compose,
    se3_apply,
    project_points,
    camera_chain,
)
from radar_depth_tpu.ops.raster import (
    rasterize_min_depth,
    accumulate_sweeps,
    radar_to_depth_map,
    extend_height,
)

__all__ = [
    "quat_to_rot",
    "se3_from_rot_trans",
    "se3_from_quat_trans",
    "se3_inverse",
    "se3_compose",
    "se3_apply",
    "project_points",
    "camera_chain",
    "rasterize_min_depth",
    "accumulate_sweeps",
    "radar_to_depth_map",
    "extend_height",
]
