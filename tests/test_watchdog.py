"""StallWatchdog unit tests (injectable clock + on_stall) and Trainer
wiring: a frozen device loop must become a loud resumable crash, not a
silent multi-hour hang (the measured relay-outage failure mode)."""

import threading
import time

import pytest

from radar_depth_tpu.utils.watchdog import StallWatchdog


def test_fires_after_timeout_without_beats():
    fired = []
    wd = StallWatchdog(timeout=0.15, on_stall=fired.append, poll=0.02)
    wd.start()
    try:
        deadline = time.monotonic() + 5.0
        while not fired and time.monotonic() < deadline:
            time.sleep(0.02)
    finally:
        wd.stop()
    assert fired and fired[0] > 0.15


def test_beats_keep_it_alive_and_stop_is_clean():
    fired = []
    wd = StallWatchdog(timeout=0.2, on_stall=fired.append, poll=0.02)
    wd.start()
    try:
        for _ in range(20):  # 0.6s of regular heartbeats > timeout
            wd.beat()
            time.sleep(0.03)
    finally:
        wd.stop()
    assert not fired
    time.sleep(0.3)  # stopped watchdog must not fire afterwards
    assert not fired


def test_timeout_zero_disables():
    fired = []
    wd = StallWatchdog(timeout=0.0, on_stall=fired.append)
    wd.start()
    time.sleep(0.1)
    wd.stop()
    assert not fired
    assert wd._thread is None  # never started a thread


def test_default_action_is_hard_exit(monkeypatch):
    """The default on_stall writes a diagnostic and os._exit(86) — a thread
    cannot raise into a blocked C call."""
    import os

    import radar_depth_tpu.utils.watchdog as mod

    calls = []
    monkeypatch.setattr(os, "_exit", lambda code: calls.append(code))
    wd = StallWatchdog(timeout=5.0, context="unit test")
    wd._default_on_stall(7.0)
    assert calls == [StallWatchdog.EXIT_CODE] == [86]


@pytest.mark.slow
def test_trainer_heartbeat_wiring(tmp_path):
    """Trainer.fit runs under a watchdog whose heartbeat advances with every
    batch (generous timeout so it never fires on CPU)."""
    from radar_depth_tpu.config import (
        AugmentConfig,
        DataConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from radar_depth_tpu.train.loop import Trainer

    beats = []
    orig_beat = StallWatchdog.beat

    def counting_beat(self):
        beats.append(1)
        return orig_beat(self)

    cfg = TrainConfig(
        data=DataConfig(height=64, width=96, num_sweeps=2, num_train=16,
                        num_val=8),
        model=ModelConfig(arch="resnet18", modality="rgbd", decoder="deconv2"),
        optim=OptimConfig(), augment=AugmentConfig(), batch_size=8,
        epochs=1, output_dir=str(tmp_path), print_freq=100,
        stall_timeout=3600.0)
    tr = Trainer(cfg)
    import unittest.mock as mock

    with mock.patch.object(StallWatchdog, "beat", counting_beat):
        tr.fit()
    # 2 train batches + 1 val batch minimum
    assert len(beats) >= 3
