"""Deterministic seeding (reference: pl.seed_everything at train.py:169 +
deterministic=True at train.py:271 — determinism is the reference's substitute
for race detection, SURVEY.md §5)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except Exception:
        pass
