"""Learning-rate scheduling engine.

Host-side replica of the reference's scheduler stack (reference:
model.py:759-817 configure_optimizers; warmup at model.py:618-622; per-batch
stepping for cosine/one_cycle at model.py:623-626; per-epoch for step/exp at
model.py:643-644; plateau on the monitored val metric at model.py:716-718).

Design: the scheduler produces PER-GROUP absolute LRs (decoder / embedding /
encoder) as plain floats each step; they enter the jitted train step as runtime
scalars, so plateau drops and warm restarts never trigger recompilation
(SURVEY.md §7 hard-parts list)."""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..config import SATConfig

GROUPS = ("decoder", "embedding", "encoder")


def cosine_t0_adjust(cfg: SATConfig, steps_per_epoch: int) -> int:
    """The reference's t0 auto-adjustment so cosine ends at min LR
    (reference: model.py:777-799; prototype dev/dev_cosine_lr.py:25-48):
    solve the geometric series for the restart count, then resize t0."""
    adj_steps = cfg.epochs * steps_per_epoch - cfg.lr_warmup_steps
    t0, tm = cfg.cosine_iterations, cfg.cosine_multi
    if tm != 1:
        restarts = math.floor(
            math.log(1 - (adj_steps * (1 - tm) / t0)) / math.log(tm))
        if restarts == 0:
            t0 = adj_steps + cfg.accumulate
        else:
            t0 = math.ceil((adj_steps + cfg.accumulate)
                           / ((1 - tm ** restarts) / (1 - tm)))
    else:
        restarts = math.floor(adj_steps / t0)
        if restarts == 0:
            t0 = adj_steps + cfg.accumulate
        else:
            t0 = math.ceil((adj_steps + cfg.accumulate) / restarts)
    return int(t0)


@dataclass
class LRScheduler:
    """Stateful LR controller covering warmup + all five reference schedulers."""
    cfg: SATConfig
    steps_per_epoch: int
    base_lrs: Dict[str, float] = field(default_factory=dict)

    def __post_init__(self):
        cfg = self.cfg
        if not self.base_lrs:
            self.base_lrs = {"decoder": cfg.decoder_lr,
                             "embedding": cfg.embedding_lr,
                             "encoder": cfg.encoder_lr}
        # one_cycle forces warmup off (reference: model.py:806)
        self.warmup_steps = 0 if cfg.scheduler == "one_cycle" else cfg.lr_warmup_steps
        # multiplicative factor mutated by step/exp/plateau (torch-style)
        self.factor = 1.0
        self.plateau_best: Optional[float] = None
        self.plateau_bad_epochs = 0
        self.sched_step = 0          # per-batch counter for cosine/one_cycle
        if cfg.scheduler == "cosine":
            self.t0 = cosine_t0_adjust(cfg, self.steps_per_epoch)
            self.tm = cfg.cosine_multi
            self.t_cur = 0
            self.t_i = self.t0
        if cfg.scheduler == "one_cycle":
            self.total_steps = cfg.epochs * self.steps_per_epoch
            self.pct_start = cfg.one_cycle_pct

    # ------------------------------------------------------------------
    # checkpointable state (resume must not reset the LR trajectory)
    # ------------------------------------------------------------------

    _STATE_KEYS = ("factor", "plateau_best", "plateau_bad_epochs",
                   "sched_step", "t_cur", "t_i")

    def state_dict(self) -> Dict[str, float]:
        return {k: getattr(self, k) for k in self._STATE_KEYS
                if hasattr(self, k) and getattr(self, k) is not None}

    def load_state_dict(self, state: Dict[str, float]) -> None:
        for k in self._STATE_KEYS:
            if k in state and state[k] is not None:
                cur = getattr(self, k, None)
                # msgpack restore yields read-only 0-d numpy arrays; in-place
                # mutations like `self.factor *= gamma` then crash with
                # "output array is read-only" — coerce to Python scalars
                v = int(state[k]) if isinstance(cur, int) else float(state[k])
                setattr(self, k, v)

    # ------------------------------------------------------------------
    # stepping hooks (mirror where Lightning/the reference step each kind)
    # ------------------------------------------------------------------

    def on_train_batch_end(self, global_step: int) -> None:
        """Per-batch schedulers step only after warmup (model.py:618-626).

        Timing: the reference steps cosine/one_cycle INSIDE training_step,
        BEFORE that batch's optimizer update — so batch t trains at f(t), not
        f(t-1).  This hook runs after batch `global_step`; it must advance
        whenever the NEXT batch is a stepping batch (next >= warmup; next is
        always > 0), or the whole LR trajectory lags the reference by one
        batch (caught by test_train_trajectory.py's literal-reference cosine
        trajectory; the old `global_step <= 0` gate was that off-by-one)."""
        if global_step + 1 < self.warmup_steps:
            return
        if self.cfg.scheduler == "cosine":
            self.t_cur += 1
            if self.t_cur >= self.t_i:
                self.t_cur -= self.t_i
                self.t_i *= max(self.tm, 1)
        elif self.cfg.scheduler == "one_cycle":
            self.sched_step += 1

    def on_train_epoch_end(self, epoch: int) -> None:
        """MultiStepLR / ExponentialLR step per epoch (model.py:643-644)."""
        if self.cfg.scheduler == "step":
            # torch MultiStepLR: multiply when the (0-indexed+1) epoch count
            # hits a milestone
            if (epoch + 1) in set(self.cfg.milestones):
                self.factor *= self.cfg.lr_gamma
        elif self.cfg.scheduler == "exp":
            self.factor *= self.cfg.lr_gamma

    def on_validation_end(self, monitor_value: float, global_step: int) -> None:
        """ReduceLROnPlateau(mode=max) after warmup (model.py:716-718).

        Improvement test = torch's rel-threshold default: value must beat
        best*(1+1e-4), so epsilon-sized metric noise counts as a bad epoch
        exactly like torch (a strict `>` would reset patience on every
        micro-oscillation and never reduce the LR)."""
        if self.cfg.scheduler != "plateau" or global_step < self.warmup_steps:
            return
        if self.plateau_best is None or \
                monitor_value > self.plateau_best * (1.0 + 1e-4):
            self.plateau_best = monitor_value
            self.plateau_bad_epochs = 0
        else:
            self.plateau_bad_epochs += 1
            if self.plateau_bad_epochs > self.cfg.plateau_patience:
                self.factor *= self.cfg.lr_gamma
                self.plateau_bad_epochs = 0

    # ------------------------------------------------------------------

    def current_lrs(self, global_step: int) -> Dict[str, float]:
        """Absolute LR per group at this step (warmup applied on top)."""
        cfg = self.cfg
        lrs = {}
        for g in GROUPS:
            base = self.base_lrs[g]
            if cfg.scheduler in ("step", "exp", "plateau"):
                lr = max(base * self.factor, cfg.min_lr)
            elif cfg.scheduler == "cosine":
                # CosineAnnealingWarmRestarts with absolute eta_min
                lr = cfg.min_lr + (base - cfg.min_lr) * (
                    1 + math.cos(math.pi * self.t_cur / self.t_i)) / 2
            elif cfg.scheduler == "one_cycle":
                lr = self._one_cycle_lr(base)
            else:
                lr = base
            lrs[g] = lr
        if self.warmup_steps > 0 and global_step < self.warmup_steps:
            # manual warmup scaling of every group (model.py:618-622)
            scale = min(1.0, (global_step + 1) / self.warmup_steps)
            lrs = {g: v * scale for g, v in lrs.items()}
        return lrs

    def _one_cycle_lr(self, max_lr: float) -> float:
        """torch OneCycleLR, cos anneal, cycle_momentum=False
        (reference: model.py:806-815)."""
        cfg = self.cfg
        initial = max_lr / cfg.one_cycle_div
        final = initial / cfg.one_cycle_fdiv
        up_steps = float(self.pct_start * self.total_steps) - 1
        down_steps = float(self.total_steps - up_steps) - 1
        t = min(self.sched_step, self.total_steps)

        def cos_anneal(start, end, pct):
            return end + (start - end) * (1 + math.cos(math.pi * pct)) / 2

        if t <= up_steps or up_steps <= 0:
            return cos_anneal(initial, max_lr, t / max(up_steps, 1e-9))
        # pct clamped to 1: torch raises past total_steps; evaluating our
        # trajectory after the final step (end-of-run logging, resume) must
        # HOLD the final_div floor, not wrap the cosine back up (pre-round-5
        # bug: lr(total_steps) bounced to mid-cycle values)
        pct = min((t - up_steps) / max(down_steps, 1e-9), 1.0)
        return cos_anneal(max_lr, final, pct)
