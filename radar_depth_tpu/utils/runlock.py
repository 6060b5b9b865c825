"""Exclusive run-directory lock for trainers.

Motivated by an observed r4 failure: a restarted experiment queue raced an
orphaned pre-restart queue, and two trainers wrote the same output dir
concurrently — interleaved CSV rows, colliding orbax saves (one died on the
other's step tmp dir, the other on a step_directory_creation timeout), and
an untrustworthy best checkpoint. The lock makes the second trainer fail
fast and loudly instead.

Ownership is a kernel flock(2) on `<output_dir>/.trainer.lock`, NOT the
file's existence: the kernel releases it the instant the holder dies, so a
SIGKILLed run never blocks its own --resume and there is no stale-pidfile
steal (two racers both observing a dead holder and deleting each other's
fresh lock — the unlink/recreate race a content-based pidfile scheme has).
The holder's pid is written into the file purely for the error message.
The lock file itself is never unlinked (deleting it would let a waiter
that already opened the old inode and a newcomer on the new inode "hold"
the lock simultaneously).
"""

from __future__ import annotations

import fcntl
import os
from typing import Dict

LOCK_NAME = ".trainer.lock"

_HELD: Dict[str, list] = {}  # abspath -> [open fd holding the flock, refcount]


def acquire_run_lock(output_dir: str) -> str:
    """flock `<output_dir>/.trainer.lock`. Raises RuntimeError if another
    live process holds it. Re-acquiring a lock this process already holds
    is refcounted (overlapping Trainer lifetimes in one test process must
    not drop the flock when the first of them releases — ADVICE r4 low).
    Returns the lock path (pass to release_run_lock)."""
    path = os.path.abspath(os.path.join(output_dir, LOCK_NAME))
    held = _HELD.get(path)
    if held is not None:
        held[1] += 1
        return path
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        try:
            holder = os.read(fd, 64).decode(errors="replace").strip() or "?"
        except OSError:
            holder = "?"
        os.close(fd)
        raise RuntimeError(
            f"{output_dir} is being written by a live trainer "
            f"(pid {holder}, lock {path}). Two trainers sharing an output "
            "dir corrupt CSVs and checkpoints — pick another --output-dir, "
            "or wait for that process to exit.") from None
    os.ftruncate(fd, 0)
    os.write(fd, f"{os.getpid()}\n".encode())
    _HELD[path] = [fd, 1]
    return path


def release_run_lock(path: str) -> None:
    """Release one acquisition of a lock this process holds. The flock (and
    fd) drop only when the last in-process holder releases. Idempotent past
    zero; foreign paths are a no-op. The file stays on disk (ownership is
    the flock, not existence)."""
    path = os.path.abspath(path)
    held = _HELD.get(path)
    if held is None:
        return
    held[1] -= 1
    if held[1] > 0:
        return
    del _HELD[path]
    fd = held[0]
    try:
        os.ftruncate(fd, 0)  # clear the stale pid hint
    except OSError:
        pass
    os.close(fd)  # closing the fd releases the flock
