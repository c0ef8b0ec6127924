"""LR schedule parity vs torch.optim.lr_scheduler oracles (the reference's
actual schedulers, model.py:759-817) + warmup/plateau/restart semantics."""

import math

import numpy as np
import pytest
import torch

from sat_tpu.config import SATConfig
from sat_tpu.train.schedules import LRScheduler, cosine_t0_adjust


def make_cfg(**kw):
    base = dict(vocab_size=10, decoder_lr=1e-3, embedding_lr=1e-2,
                encoder_lr=1e-5, epochs=10)
    base.update(kw)
    return SATConfig(**base)


def torch_opt(lr=1e-3):
    p = torch.nn.Parameter(torch.zeros(1))
    return torch.optim.SGD([p], lr=lr)


def test_multistep_matches_torch():
    cfg = make_cfg(scheduler="step", milestones=(3, 7), lr_gamma=0.1, epochs=10)
    sched = LRScheduler(cfg, steps_per_epoch=5)
    opt = torch_opt(1e-3)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[3, 7], gamma=0.1)
    for epoch in range(10):
        ours = sched.current_lrs(global_step=epoch * 5)["decoder"]
        theirs = opt.param_groups[0]["lr"]
        assert abs(ours - theirs) < 1e-12, (epoch, ours, theirs)
        sched.on_train_epoch_end(epoch)
        tsched.step()


def test_exponential_matches_torch():
    cfg = make_cfg(scheduler="exp", lr_gamma=0.9, epochs=10)
    sched = LRScheduler(cfg, steps_per_epoch=5)
    opt = torch_opt(1e-3)
    tsched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9)
    for epoch in range(10):
        ours = sched.current_lrs(global_step=epoch * 5)["decoder"]
        assert abs(ours - opt.param_groups[0]["lr"]) < 1e-12
        sched.on_train_epoch_end(epoch)
        tsched.step()


def test_cosine_warm_restarts_matches_torch():
    cfg = make_cfg(scheduler="cosine", cosine_iterations=40, cosine_multi=1,
                   epochs=4, min_lr=1e-5, lr_warmup_steps=0, accumulate=1)
    steps_per_epoch = 25
    sched = LRScheduler(cfg, steps_per_epoch=steps_per_epoch)
    t0 = cosine_t0_adjust(cfg, steps_per_epoch)
    opt = torch_opt(1e-3)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=1, eta_min=1e-5)
    lrs_ours, lrs_torch = [], []
    for step in range(4 * steps_per_epoch):
        lrs_ours.append(sched.current_lrs(step)["decoder"])
        lrs_torch.append(opt.param_groups[0]["lr"])
        sched.on_train_batch_end(step)  # production gate (reference steps
        tsched.step()                   # per batch INSIDE training_step)
    np.testing.assert_allclose(lrs_ours, lrs_torch, rtol=1e-6)
    # t0 adjustment ends near min lr (dev/dev_cosine_lr.py:69 'Last lr=')
    assert lrs_ours[-1] < 1e-3 * 0.2


def test_one_cycle_matches_torch():
    cfg = make_cfg(scheduler="one_cycle", epochs=3, one_cycle_pct=0.3,
                   one_cycle_div=25, one_cycle_fdiv=1e4)
    spe = 20
    sched = LRScheduler(cfg, steps_per_epoch=spe)
    opt = torch_opt(1e-3)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, epochs=3, steps_per_epoch=spe, pct_start=0.3,
        cycle_momentum=False, div_factor=25, final_div_factor=1e4)
    lrs_ours, lrs_torch = [], []
    for step in range(3 * spe):
        lrs_ours.append(sched.current_lrs(step)["decoder"])
        lrs_torch.append(opt.param_groups[0]["lr"])
        sched.on_train_batch_end(step)
        if step < 3 * spe - 1:
            tsched.step()
    np.testing.assert_allclose(lrs_ours, lrs_torch, rtol=1e-5)
    assert abs(lrs_ours[0] - 1e-3 / 25) / (1e-3 / 25) < 1e-6  # starts at initial
    assert lrs_ours[-1] < 1e-6  # ends near final_div floor


def test_warmup_scaling():
    cfg = make_cfg(scheduler=None, lr_warmup_steps=10)
    sched = LRScheduler(cfg, steps_per_epoch=100)
    # lr scales linearly (model.py:618-622): min(1, (step+1)/warmup)
    assert abs(sched.current_lrs(0)["decoder"] - 1e-3 * 0.1) < 1e-12
    assert abs(sched.current_lrs(4)["decoder"] - 1e-3 * 0.5) < 1e-12
    assert abs(sched.current_lrs(10)["decoder"] - 1e-3) < 1e-12
    # all groups scale together
    assert abs(sched.current_lrs(4)["embedding"] - 1e-2 * 0.5) < 1e-12


def test_plateau_max_mode():
    cfg = make_cfg(scheduler="plateau", plateau_patience=2, lr_gamma=0.5)
    sched = LRScheduler(cfg, steps_per_epoch=10)
    vals = [0.1, 0.2, 0.15, 0.15, 0.15, 0.15]  # improves, then stalls
    for v in vals:
        sched.on_validation_end(v, global_step=100)
    # stall of 4 evals after best with patience 2 -> one drop
    assert abs(sched.current_lrs(100)["decoder"] - 1e-3 * 0.5) < 1e-12
    # recovery resets the counter
    sched.on_validation_end(0.5, global_step=200)
    for _ in range(2):
        sched.on_validation_end(0.4, global_step=200)
    assert abs(sched.current_lrs(200)["decoder"] - 1e-3 * 0.5) < 1e-12


def test_plateau_rel_threshold_matches_torch():
    """Micro-oscillations below torch's rel threshold (1e-4) must count as
    bad epochs — a strict `>` would reset patience every other eval and the
    LR would never drop.  Oracle: torch.optim.lr_scheduler.ReduceLROnPlateau."""
    import torch
    cfg = make_cfg(scheduler="plateau", plateau_patience=2, lr_gamma=0.5)
    sched = LRScheduler(cfg, steps_per_epoch=10)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=2, min_lr=cfg.min_lr)
    # +1e-6 bumps every other epoch around a true plateau
    vals = [0.30, 0.300001, 0.30, 0.300002, 0.30, 0.300001, 0.30, 0.300003,
            0.31, 0.30, 0.31 * (1 + 2e-4)]  # then a real improvement
    for v in vals:
        sched.on_validation_end(v, global_step=100)
        ref.step(v)
        assert abs(sched.current_lrs(100)["decoder"]
                   - opt.param_groups[0]["lr"]) < 1e-12, v


def test_restart_detection_for_checkpointing():
    """Cosine restarts raise the LR -> RestartCheckpoint triggers
    (util.py:167-183)."""
    cfg = make_cfg(scheduler="cosine", cosine_iterations=10, cosine_multi=1,
                   epochs=2, min_lr=0.0, accumulate=1)
    sched = LRScheduler(cfg, steps_per_epoch=20)
    prev, rises = sched.current_lrs(1)["decoder"], 0
    for step in range(1, 40):
        sched.on_train_batch_end(step)
        cur = sched.current_lrs(step)["decoder"]
        if cur > prev:
            rises += 1
        prev = cur
    assert rises >= 1


def test_scheduler_state_restores_to_mutable_scalars():
    """Checkpoint restore hands back read-only 0-d numpy arrays; in-place
    scheduler mutations (factor *= gamma) must not crash after resume."""
    import numpy as np
    cfg = make_cfg(scheduler="plateau", plateau_patience=0, lr_gamma=0.5)
    s1 = LRScheduler(cfg, steps_per_epoch=10)
    s1.on_validation_end(0.3, global_step=100)
    sd = {k: np.asarray(v) for k, v in s1.state_dict().items()}
    for a in sd.values():
        a.setflags(write=False)
    s2 = LRScheduler(cfg, steps_per_epoch=10)
    s2.load_state_dict(sd)
    s2.on_validation_end(0.1, global_step=100)  # patience 0 -> factor *= 0.5
    assert s2.factor == pytest.approx(0.5)
    assert s2.plateau_best == pytest.approx(0.3)  # registry carried over
