"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2 parallelism table: no DDP, no
collectives). TPU-native scaling is data-parallel over a 1-axis mesh: batches
shard over `data`, parameters replicate, and XLA/GSPMD inserts the psums for
loss/metric reductions — there is no hand-written collective anywhere. The
mesh abstraction keeps room for more axes (a future (dcn, ici) 2-axis layout)
without touching step functions.
"""

from radar_depth_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_spatial_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    spatial_constraint,
    pad_batch_to,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_spatial_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "spatial_constraint",
    "pad_batch_to",
]
