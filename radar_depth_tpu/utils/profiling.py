"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference only has wall-clock meters (data_time/gpu_time in
upstream:metrics.py::Result, timed around torch.cuda.synchronize). Kept here:
the same two fields flow through the CSV logs (utils/csvlog.py). Added beyond
the reference: jax.profiler integration — on-demand device traces viewable in
TensorBoard/XProf, plus step annotations.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with device_trace("runs/exp1/trace"):
            train_step(...)

    View with: tensorboard --logdir runs/exp1/trace (XProf plugin)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """data_time/gpu_time accounting for one loop iteration, mirroring the
    reference's AverageMeter usage in train()/validate() (SURVEY.md §3.1)."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self._t = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        self.data_time = now - self._t
        self._t = now

    def step_done(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.step_time = now - self._t
        self._t = now
