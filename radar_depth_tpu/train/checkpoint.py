"""Checkpoint/resume with reference semantics on orbax (SURVEY.md §5):
per-epoch checkpoints + a `model_best` copy when val RMSE improves;
--resume restores params/batch_stats/optimizer/epoch/best; --evaluate loads
for validation only (upstream:utils.py::save_checkpoint, upstream:main.py
resume branch; C10).

Unlike the reference (which pickles the whole nn.Module), checkpoints are pure
pytrees {state, epoch, best_rmse} — portable across code versions and
shardings (orbax restores to whatever mesh the state template carries).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from radar_depth_tpu.train.state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _sweep_stale_tmp(ckpt_dir: str) -> list:
    """Remove `<step>.orbax-checkpoint-tmp` dirs left by a save that was
    SIGKILLed mid-commit. They are uncommitted by construction (orbax renames
    atomically on commit), but a later save of the SAME step in that dir dies
    with FileExistsError on the tmp path — observed when a killed epoch-0
    save blocked a fresh run in the same output dir. Returns removed paths.

    The pattern also accepts orbax's `-<timestamp>` tmp suffix, used on
    filesystems without atomic rename (e.g. GCS), where the plain form never
    appears (ADVICE r4 low)."""
    import re
    import shutil

    removed = []
    if not os.path.isdir(ckpt_dir):
        return removed
    for name in os.listdir(ckpt_dir):
        if re.fullmatch(r"\d+\.orbax-checkpoint-tmp(-\d+)?", name):
            path = os.path.join(ckpt_dir, name)
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed


class CheckpointManager:
    def __init__(self, output_dir: str, max_to_keep: int = 3,
                 sweep_stale: bool = True):
        """sweep_stale must be False for READ-ONLY openers (--evaluate): a
        live trainer's in-flight async save uses the same tmp naming, and
        sweeping it from a second process would truncate that save. Writers
        hold the run-dir lock (utils/runlock.py), so their sweep only ever
        sees tmp dirs from their own dead predecessors."""
        from orbax.checkpoint import checkpoint_managers as cm

        self.dir = _abs(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        if sweep_stale:
            for path in _sweep_stale_tmp(self.dir):
                print(f"removed stale interrupted-save dir {path}")
        # Preserve the latest epoch AND the best-N by val RMSE. best_fn alone
        # would let orbax delete the latest checkpoint whenever it is not
        # among the best, silently rewinding --resume to an older epoch
        # (reference semantics: resume-from-last + model_best copy,
        # upstream:utils.py::save_checkpoint; ADVICE r1 medium #2).
        policy = cm.AnyPreservationPolicy([
            cm.LatestN(1),
            cm.BestN(get_metric_fn=lambda m: m["rmse"], reverse=True,
                     n=max_to_keep),
        ])
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                create=True, preservation_policy=policy,
                best_fn=lambda m: m["rmse"], best_mode="min",
            ),
        )

    def save(self, epoch: int, state: TrainState, metrics: Dict[str, float],
             wait: bool = False) -> None:
        """Asynchronous by default (SURVEY.md §5: "orbax gives atomic async
        checkpoints"): the state snapshot is taken synchronously here (the
        caller passes host numpy trees — jax.Array donation in the train step
        means device buffers must not be aliased into a background save), and
        the orbax serialization+disk commit overlaps the next epoch. Readers
        (restore/best_step) and close() drain the in-flight save; orbax also
        drains automatically if the next save starts first. wait=True forces
        the old blocking behavior."""
        payload = {
            "state": jax.tree_util.tree_map(np.asarray, state),
            "epoch": epoch,
            "rmse": float(metrics.get("rmse", np.inf)),
        }
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(payload),
            metrics={"rmse": float(metrics.get("rmse", np.inf))},
        )
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, int, float]:
        """Returns (state, epoch, best_rmse_so_far) — the reference's --resume
        restores model+optimizer+epoch+best_result (SURVEY.md §2 C10)."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        template = {
            "state": jax.tree_util.tree_map(np.asarray, state_template),
            "epoch": 0,
            "rmse": float("inf"),
        }
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        best = self._mgr.best_step()
        best_rmse = float(payload["rmse"])
        if best is not None and best != step:
            try:
                bp = self._mgr.restore(best, args=ocp.args.StandardRestore(template))
                best_rmse = min(best_rmse, float(bp["rmse"]))
            except Exception:
                pass
        return payload["state"], int(payload["epoch"]), best_rmse

    def best_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_for_evaluate(path: str, state_template: TrainState) -> TrainState:
    """--evaluate CKPT: load a checkpoint directory produced by
    CheckpointManager (either the run dir or a specific step dir)."""
    path = _abs(path)
    if os.path.basename(path).isdigit():
        run_dir = os.path.dirname(path)
        step = int(os.path.basename(path))
    else:
        if os.path.basename(path) != "checkpoints":
            path = os.path.join(path, "checkpoints")
        mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                best_fn=lambda m: m["rmse"], best_mode="min"),
        )
        step = mgr.best_step()
        if step is None:
            step = mgr.latest_step()
        mgr.close()
        run_dir = path
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    ckptr = ocp.StandardCheckpointer()
    template = {
        "state": jax.tree_util.tree_map(np.asarray, state_template),
        "epoch": 0,
        "rmse": float("inf"),
    }
    payload = ckptr.restore(
        os.path.join(run_dir, str(step), "default"), template
    )
    return payload["state"]
