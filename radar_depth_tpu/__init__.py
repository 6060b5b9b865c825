"""radar_depth_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of brade31919/radar_depth (IROS 2020, "Depth Estimation from
Monocular Images and Sparse Radar Data").

Built from scratch against the blueprint in /root/repo/SURVEY.md. The reference
mount (/root/reference) was empty in every session so far, so reference
citations use the ``upstream:<path>::<symbol>`` convention defined in
SURVEY.md's provenance note rather than file:line.

Layout (mirrors SURVEY.md §7):
  ops/         batched geometry + rasterization kernels (the reference's
               offline nuScenes preprocessing, upstream:scripts/*, re-designed
               as fused on-device XLA/Pallas code)
  models/      ResNet-18/34 encoder-decoder zoo (upstream:models.py) in flax
  objectives/  masked L1/L2 losses (upstream:criteria.py)
  metrics/     Result/AverageMeter equivalents (upstream:metrics.py)
  data/        sample schema, synthetic nuScenes fixture generator, loaders
  parallel/    mesh + sharding helpers (reference had none; DP over ICI here)
  train/       pjit training harness (upstream:main.py)
  utils/       csv logging, viz, torch checkpoint conversion (upstream:utils.py)
"""

__version__ = "0.1.0"
