"""High-level inference API — load a trained run and predict depth from raw
samples (the serving-style entry point; the reference only offers
--evaluate via main.py, SURVEY.md §3.2 — this is a superset).

    from radar_depth_tpu.inference import Predictor
    p = Predictor.from_run("runs/ms")            # best checkpoint
    depth = p.predict(batch)                      # (B, H, W) meters
    metrics = p.evaluate(batch)                   # Result-style dict

The whole raw-batch → preproc → two-stage forward path is one jitted graph,
dispatched asynchronously; predictions stream without per-call host syncs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from radar_depth_tpu.config import TrainConfig
from radar_depth_tpu.metrics import compute_metric_sums, finalize_metrics
from radar_depth_tpu.models import create_model
from radar_depth_tpu.ops.preprocess import (
    PreprocessConfig,
    pack_model_inputs,
    prepare_eval_batch,
)
from radar_depth_tpu.train import checkpoint as ckpt_lib
from radar_depth_tpu.train.state import create_train_state, make_optimizer
from radar_depth_tpu.train.step import init_model


def load_serving(path: str):
    """Load a serving artifact written by Predictor.export_serving. Returns a
    callable: raw schema batch (dict of arrays, fixed batch size) → (B, H, W)
    depth. The artifact embeds weights and the full preprocessing graph."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def serve(batch: Dict) -> np.ndarray:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return np.asarray(exp.call(batch))

    return serve


def _arch_kwargs(cfg: TrainConfig) -> Dict:
    """Arch-specific create_model kwargs, mirroring Trainer exactly so a run
    trained with non-default radar filtering (--filter-mode/--*-threshold) is
    served with the same stage-2 filter (ADVICE r1 medium #1)."""
    if "multistage" not in cfg.model.arch:
        return {}
    return dict(
        filter_mode=cfg.model.filter_mode,
        abs_threshold=cfg.model.abs_threshold,
        rel_threshold=cfg.model.rel_threshold,
        stage2_coarse=cfg.model.stage2_coarse,
    )


class Predictor:
    """Checkpoint-backed depth predictor."""

    def __init__(self, cfg: TrainConfig, params, batch_stats):
        self.cfg = cfg
        spec = cfg.data.sample_spec()
        self.model, self.arch_spec = create_model(
            cfg.model.arch,
            modality=cfg.model.modality,
            decoder=cfg.model.decoder,
            output_size=(spec.height, spec.width),
            dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.model.dtype],
            **_arch_kwargs(cfg),
        )
        self.params = params
        self.batch_stats = batch_stats
        self._pre = PreprocessConfig(
            spec=spec, height_extension=cfg.data.height_extension,
            raster_backend=cfg.data.raster_backend)
        # cfg.spatial > 1: serve over a (data, space) mesh — image height
        # sharded, GSPMD conv halo exchanges — for resolutions whose
        # activations exceed one chip (parallel/mesh.py::make_spatial_mesh;
        # equality vs the unsharded graph pinned in tests/test_spatial.py).
        self._mesh = None
        if cfg.spatial > 1:
            from radar_depth_tpu.parallel.mesh import (
                batch_sharding,
                make_spatial_mesh,
                replicated_sharding,
            )

            self._mesh = make_spatial_mesh(cfg.spatial)
            repl = replicated_sharding(self._mesh)
            self.params = jax.device_put(self.params, repl)
            self.batch_stats = jax.device_put(self.batch_stats, repl)
            self._infer = jax.jit(
                self._infer_fn,
                in_shardings=(repl, repl, batch_sharding(self._mesh)),
                out_shardings=batch_sharding(self._mesh))
        else:
            self._infer = jax.jit(self._infer_fn)

    @classmethod
    def from_run(cls, run_dir: str, cfg: Optional[TrainConfig] = None,
                 **cfg_overrides) -> "Predictor":
        """Load the best (else latest) checkpoint of a training run. Run dirs
        written by Trainer are self-describing (config.json), so arch/data
        flags are recovered automatically; pass cfg or cfg_overrides to
        override (overrides are top-level TrainConfig fields)."""
        import dataclasses as _dc
        import os as _os

        if cfg is None:
            cfg_path = _os.path.join(run_dir, "config.json")
            if _os.path.isfile(cfg_path):
                from radar_depth_tpu.config import load_config

                cfg = _dc.replace(load_config(cfg_path), **cfg_overrides)
            else:
                cfg = TrainConfig(**cfg_overrides)
        model, arch_spec = create_model(
            cfg.model.arch, modality=cfg.model.modality,
            decoder=cfg.model.decoder,
            output_size=(cfg.data.height, cfg.data.width),
            dtype={"float32": jnp.float32,
                   "bfloat16": jnp.bfloat16}[cfg.model.dtype],
            **_arch_kwargs(cfg),
        )
        variables = init_model(model, arch_spec, cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg.optim, 1)
        template = create_train_state(variables, tx)
        state = ckpt_lib.restore_for_evaluate(
            run_dir, jax.tree_util.tree_map(np.asarray, template))
        return cls(cfg, state.params, state.batch_stats)

    def _infer_fn(self, params, batch_stats, batch):
        prepared = prepare_eval_batch(batch, self._pre)
        if self._mesh is not None:
            from radar_depth_tpu.parallel.mesh import spatial_constraint

            prepared = spatial_constraint(prepared, self._mesh)
        inputs = pack_model_inputs(prepared, self.arch_spec.input_kind,
                                   self.cfg.model.modality)
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, *inputs,
            train=False)
        pred = out[1] if self.arch_spec.multistage else out
        if self.arch_spec.multistage and self.cfg.model.blend_tau > 0:
            from radar_depth_tpu.models.fusion import blend_by_brightness

            pred = blend_by_brightness(out[0], out[1], prepared["rgb"],
                                       self.cfg.model.blend_tau)
        return pred[..., 0], prepared["target"][..., 0]

    def predict(self, batch: Dict, max_tile: int = 128) -> np.ndarray:
        """Raw schema batch → (B, H, W) predicted depth in meters.

        Requests are tiled into power-of-two chunks of at most ``max_tile``
        samples (short tails padded by repeating the last sample, padding
        sliced off the output). Rationale (NOTES.md "B>128 cliff"): XLA on
        this backend pads non-pow2 batch dims per-op to pow2 tiles — a
        B=144 program allocates MORE temp HBM than B=256 and collapses to
        ~40% throughput — and every distinct request size would otherwise
        compile its own program. Per-sample independence (eval-mode BN, no
        cross-batch ops) makes tiling value-identical to a single call."""
        arrs = {k: np.asarray(v) for k, v in batch.items()}
        b = next(iter(arrs.values())).shape[0]
        tile = 1
        while tile < b and tile < max_tile:
            tile *= 2
        if self._mesh is not None:
            # Sharded leading dims must divide by the data-axis size; short
            # requests pad up to it (data-axis sizes are powers of two).
            tile = max(tile, int(self._mesh.shape["data"]))
        outs = []
        for i in range(0, b, tile):
            chunk = {k: v[i:i + tile] for k, v in arrs.items()}
            n = next(iter(chunk.values())).shape[0]
            if n < tile:
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[-1:], tile - n, axis=0)], axis=0)
                    for k, v in chunk.items()}
            pred, _ = self._infer(self.params, self.batch_stats,
                                  {k: jnp.asarray(v) for k, v in chunk.items()})
            outs.append(np.asarray(pred)[:n])
        return np.concatenate(outs, axis=0)

    def export_serving(self, path: str, batch_size: int) -> int:
        """Serialize the ENTIRE raw-batch → depth inference graph (fused
        on-device preproc + two-stage forward, weights baked in) to a
        StableHLO artifact via jax.export — deployable to a serving runtime
        with no Python model code or checkpoint loading. Returns the
        serialized byte count. Load with :func:`load_serving`.

        TPU-native deployment story the reference lacks entirely (its serving
        surface is `--evaluate` + pickled nn.Modules, SURVEY.md §3.2)."""
        from jax import export as jexport

        from radar_depth_tpu.data.schema import sample_dtypes, sample_shapes

        spec = self.cfg.data.sample_spec()
        shapes = sample_shapes(spec)
        dtypes = sample_dtypes()
        batch_spec = {
            k: jax.ShapeDtypeStruct((batch_size,) + shapes[k], dtypes[k])
            for k in shapes
        }

        def serve(batch):
            pred, _ = self._infer_fn(self.params, self.batch_stats, batch)
            return pred

        exp = jexport.export(jax.jit(serve))(batch_spec)
        blob = exp.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    def predict_stream(self, batches, depth: int = 2):
        """Pipelined streaming inference: yields (B, H, W) depth maps for an
        iterator of raw batches while keeping up to ``depth`` dispatches in
        flight, so host upload of batch i+1 overlaps device compute of batch
        i (steady-state serving loop; dispatches are async in JAX, the fetch
        is the only sync point)."""
        from collections import deque

        inflight: deque = deque()
        for batch in batches:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            inflight.append(self._infer(self.params, self.batch_stats, batch))
            if len(inflight) >= depth:
                pred, _ = inflight.popleft()
                yield np.asarray(pred)
        while inflight:
            pred, _ = inflight.popleft()
            yield np.asarray(pred)

    def evaluate(self, batch: Dict) -> Dict[str, float]:
        """Raw schema batch → reference Result-style metrics dict."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        pred, target = self._infer(self.params, self.batch_stats, batch)
        sums = compute_metric_sums(pred[..., None], target[..., None],
                                   self.cfg.metric_avg)
        return finalize_metrics(jax.tree_util.tree_map(np.asarray, sums))
