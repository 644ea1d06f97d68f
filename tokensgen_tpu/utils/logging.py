"""Observability: TensorBoard scalars, parameter audit files, profiling hooks.

Reference parity (SURVEY §5.5): `report_to: tensorboard` logging a `train_loss`
scalar per step (`train_cogvideo_to2v.py:1586-1588,2028`), trainable/frozen
parameter audit files `rec_para.txt` / `rec_para_train.txt` (`:1504-1519`).
Plus what the reference lacks (SURVEY §5.1): `jax.profiler` trace capture.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import numpy as np


class TBLogger:
    """TensorBoard scalar writer; silently degrades to a CSV file when
    tensorboard is unavailable."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None
        self._csv = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            os.makedirs(log_dir, exist_ok=True)
            self._csv = open(os.path.join(log_dir, "scalars.csv"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)
        elif self._csv is not None:
            self._csv.write(f"{step},{tag},{value}\n")
            self._csv.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        if self._csv is not None:
            self._csv.close()


class ParamAudit:
    """Writes rec_para.txt (all params) and rec_para_train.txt (trainables)."""

    def __init__(self, run_dir: str):
        self.run_dir = run_dir

    def write(self, params, labels) -> None:
        import flax

        flat = flax.traverse_util.flatten_dict(params)
        flat_labels = flax.traverse_util.flatten_dict(labels)
        total, trainable = 0, 0
        with open(os.path.join(self.run_dir, "rec_para.txt"), "w") as f_all, \
                open(os.path.join(self.run_dir, "rec_para_train.txt"), "w") as f_tr:
            for key, val in sorted(flat.items()):
                name = "/".join(map(str, key))
                n = int(np.prod(np.asarray(val).shape))
                total += n
                f_all.write(f"{name}\t{tuple(np.asarray(val).shape)}\t{n}\n")
                if flat_labels.get(key) == "train":
                    trainable += n
                    f_tr.write(f"{name}\t{tuple(np.asarray(val).shape)}\t{n}\n")
            f_all.write(f"# total: {total}\n")
            f_tr.write(f"# trainable: {trainable} / {total}\n")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock EMA, for sampler-loop timing (SURVEY §5.1)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None

    def update(self, dt: float) -> float:
        self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        return self.ema
