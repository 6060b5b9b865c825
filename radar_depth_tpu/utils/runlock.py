"""Exclusive run-directory lock for trainers.

Motivated by an observed r4 failure: a restarted experiment queue raced an
orphaned pre-restart queue, and two trainers wrote the same output dir
concurrently — interleaved CSV rows, colliding orbax saves (one died on the
other's step tmp dir, the other on a step_directory_creation timeout), and
an untrustworthy best checkpoint. A pidfile lock makes the second trainer
fail fast and loudly instead.

Stale locks (holder pid no longer alive) are stolen automatically, so a
SIGKILLed run never blocks its own --resume.
"""

from __future__ import annotations

import os

LOCK_NAME = ".trainer.lock"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def acquire_run_lock(output_dir: str) -> str:
    """Create `<output_dir>/.trainer.lock` holding our pid. Raises
    RuntimeError if another LIVE process holds it; steals a stale lock.
    Returns the lock path (pass to release_run_lock)."""
    path = os.path.join(output_dir, LOCK_NAME)
    for _ in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(path) as f:
                    holder = int(f.read().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            if holder and holder != os.getpid() and _pid_alive(holder):
                raise RuntimeError(
                    f"{output_dir} is being written by a live trainer "
                    f"(pid {holder}, lock {path}). Two trainers sharing an "
                    "output dir corrupt CSVs and checkpoints — pick another "
                    "--output-dir, or remove the lock if that pid is not a "
                    "trainer.")
            os.unlink(path)  # stale (dead holder) — steal
            continue
        with os.fdopen(fd, "w") as f:
            f.write(f"{os.getpid()}\n")
        return path
    raise RuntimeError(f"could not acquire {path} after stale-steal retry")


def release_run_lock(path: str) -> None:
    """Remove the lock iff we still own it. Idempotent."""
    try:
        with open(path) as f:
            if int(f.read().strip() or "0") != os.getpid():
                return
    except (OSError, ValueError):
        return
    try:
        os.unlink(path)
    except OSError:
        pass
