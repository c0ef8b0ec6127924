"""TensorBoard logging with the reference's exact tag layout (reference:
model.py:599-612 per-step '{k}/train'; model.py:630-640 '{k}/train_epoch' +
'Learning Rate'; model.py:699-709 '{k}/val_epoch'; auto-versioned
logs/{name}/version_N dirs, train.py:174-177).

Falls back to a JSONL writer when tensorboard isn't importable."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


def next_version_dir(save_dir: str, name: str, create: bool = True) -> str:
    """Auto-versioned logs/{name}/version_N (reference: train.py:174-177).

    create=False computes the path without touching the filesystem —
    multi-host non-writer processes must not mkdir on a shared FS (they'd
    race process 0 and claim version numbers of their own)."""
    base = os.path.join(save_dir, name)
    if create:
        os.makedirs(base, exist_ok=True)
    versions = [int(d.split("_")[1]) for d in os.listdir(base)
                if d.startswith("version_") and d.split("_")[1].isdigit()] \
        if os.path.isdir(base) else []
    v = max(versions) + 1 if versions else 0
    path = os.path.join(base, f"version_{v}")
    if create:
        os.makedirs(path, exist_ok=True)
    return path


class MetricsLogger:
    def __init__(self, logdir: str, enabled: bool = True):
        self.logdir = logdir
        self._tb = None
        self.enabled = enabled  # multi-host: only process 0 writes
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=step)
        else:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                          "step": int(step)}) + "\n")
            self._jsonl.flush()

    def train_step(self, metrics: Dict[str, float], step: int) -> None:
        for k, v in metrics.items():
            self.scalar(f"{k}/train", float(v), step)

    def train_epoch(self, metrics: Dict[str, float], epoch: int,
                    lr: Optional[float] = None) -> None:
        for k, v in metrics.items():
            self.scalar(f"{k}/train_epoch", float(v), epoch + 1)
        if lr is not None:
            self.scalar("Learning Rate", lr, epoch + 1)

    def val_epoch(self, metrics: Dict[str, float], epoch: int) -> None:
        for k, v in metrics.items():
            self.scalar(f"{k}/val_epoch", float(v), epoch + 1)

    def close(self) -> None:
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
        else:
            self._jsonl.close()
