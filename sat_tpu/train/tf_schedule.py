"""Teacher-forcing epsilon schedules (reference: model.py:565-582;
prototype dev/dev_tf_schedule.py).

epsilon = P(feed ground truth).  All schedules are plain host-side floats —
epsilon enters the jitted train step as a runtime scalar input, never a traced
constant, so schedule changes don't recompile."""

from __future__ import annotations

import math

from ..config import SATConfig


def teacher_forcing_epsilon(cfg: SATConfig, current_epoch: int) -> float:
    if cfg.decoder_tf is None:
        return 0.0
    if cfg.decoder_tf == "always":
        return 1.0
    if cfg.decoder_tf == "linear":
        # Decays to decoder_tf_min by the final epoch
        return 1.0 - (1.0 - cfg.decoder_tf_min) * current_epoch / cfg.epochs
    if cfg.decoder_tf == "inv_sigmoid":
        # Shift the 50% point to b, slope g=5; b derived from decoder_tf_min & epochs
        l = -math.log(cfg.decoder_tf_min / (1.0 - cfg.decoder_tf_min))
        g = 5.0
        b = (1.0 / ((l / g) + 1.0)) * cfg.epochs
        return 1.0 / (1.0 + math.exp((g / b) * (current_epoch - b)))
    if cfg.decoder_tf == "exp":
        # Exponential decay reaching decoder_tf_min at the final epoch
        return math.exp(math.log(cfg.decoder_tf_min) / cfg.epochs) ** current_epoch
    raise ValueError(f"unknown decoder_tf: {cfg.decoder_tf}")
