"""Stall watchdog for long-running device loops.

Motivation (measured, NOTES.md "relay outage" row): the device backend can
wedge so that an in-flight dispatch blocks FOREVER with zero CPU progress —
a multi-hour outage froze a training run mid-epoch with nothing crashing.
Checkpoint saves are atomic and `--resume` recovers exactly (tested incl.
SIGKILL mid-save), so the right behavior is to DIE LOUDLY once no progress
has been made for a generous window, converting a silent hang into a
resumable crash an operator (or supervisor loop) can act on.

A Python thread cannot interrupt a blocked C call, so the watchdog hard-
exits the process (`os._exit`) — regular exception raising would never run.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional


class StallWatchdog:
    """Fires `on_stall(seconds_stalled)` if `beat()` isn't called for
    `timeout` seconds. Default action prints a diagnostic and hard-exits
    with code 86 (resumable-crash convention; see Trainer --stall-timeout).

    `clock` and `on_stall` are injectable for tests."""

    EXIT_CODE = 86

    def __init__(self, timeout: float, context: str = "",
                 on_stall: Optional[Callable[[float], None]] = None,
                 clock: Callable[[], float] = time.monotonic,
                 poll: Optional[float] = None):
        self.timeout = float(timeout)
        self.context = context
        self._clock = clock
        self._poll = poll if poll is not None else max(1.0, timeout / 20.0)
        self._on_stall = on_stall or self._default_on_stall
        self._last = clock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _default_on_stall(self, stalled: float) -> None:
        import os
        import sys

        sys.stderr.write(
            f"StallWatchdog: no progress for {stalled:.0f}s "
            f"(timeout {self.timeout:.0f}s){' in ' + self.context if self.context else ''} — "
            "the device backend is likely wedged (see NOTES.md relay-outage "
            "row). Exiting 86; checkpoints are atomic, restart with "
            "--resume.\n")
        sys.stderr.flush()
        os._exit(self.EXIT_CODE)

    def beat(self) -> None:
        """Mark progress. Cheap (one clock read + store); call per step."""
        self._last = self._clock()

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            stalled = self._clock() - self._last
            if stalled > self.timeout:
                self._on_stall(stalled)
                return

    def start(self) -> "StallWatchdog":
        if self.timeout <= 0:
            return self  # disabled
        self._last = self._clock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stall-watchdog")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def __enter__(self) -> "StallWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
