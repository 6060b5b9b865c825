"""Optional TensorBoard scalar logging (SURVEY.md §5: reference has only CSV;
TensorBoard is an addition, gated on tensorflow being importable)."""

from __future__ import annotations

from typing import Dict


class TensorBoardLogger:
    """Writes per-epoch scalars under train/ and val/ tags. No-op (with a
    one-time notice) if tensorflow isn't available."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._writer = tf.summary.create_file_writer(log_dir)
            self._tf = tf
        except Exception:
            print("tensorboard logging disabled (tensorflow unavailable)")

    def log(self, prefix: str, epoch: int, metrics: Dict[str, float]) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tf.summary.scalar(f"{prefix}/{k}", v, step=epoch)
        self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
