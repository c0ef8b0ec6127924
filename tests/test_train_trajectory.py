"""Multi-step training-trajectory parity against the reference's OWN training
loop (VERDICT r2 next-round item #1 — the last unpinned seam).

Three layers, strongest-to-broadest:

* **Gradient parity** — torch autograd through the literal reference
  training_step loss (model.py:474-557, 588-594) vs jax.grad of the
  production inline-loss scan, leaf by leaf through the production weight
  converter (layout mapping is linear, so it maps gradients too).
* **Optimizer/update-rule parity, fp64, synthetic gradients** — the
  optimizer the reference's own configure_optimizers (model.py:720-817)
  constructs vs the production optax chain (train/optim.py +
  apply_group_lrs + LRScheduler warmup), driven by IDENTICAL synthetic fp64
  gradient sequences.  This pins Adam eps placement, SGD wd-before-momentum,
  nesterov, clip value/norm interplay (incl. torch's 1e-6 norm eps), warmup
  scaling, and per-group LRs at ~1e-12 — free of forward-pass noise.
* **Full literal trajectory, fp32** — N>=6 steps of
  sat.training_step(batch) -> backward -> Lightning-style clip ->
  optimizer.step() (+ training_epoch_end per-epoch scheduler steps) vs the
  production pieces (jax.value_and_grad + build_optimizer + LRScheduler),
  asserting per-step loss and full param-tree agreement.  fp64 through the
  literal code is impossible: the reference hard-casts logits to fp32
  (model.py:548), so tolerances are fp32-scale (measured headroom ~30x:
  per-leaf gradient max-abs-diff is ~1.5e-8 at init).

This suite caught a real off-by-one: the per-batch cosine/one_cycle stepping
happens INSIDE the reference's training_step before that batch's update
(model.py:623-626), so batch t trains at f(t); the production
on_train_batch_end gate used to leave batch t at f(t-1)
(train/schedules.py on_train_batch_end docstring).
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import make_captions, make_pair  # noqa: E402

pytestmark = pytest.mark.slow

R, T = 5, 9          # 5 reference captions per image (B=1: the regime where
N_STEPS = 6          # the reference's InitLSTM reshape is row-independent)
STEPS_PER_EPOCH = 3


@pytest.fixture(scope="module")
def refmod():
    from _reference_harness import load_reference
    model, restore = load_reference()
    try:
        yield model
    finally:
        restore()


# Reference hparams read by configure_optimizers + training_step
# (model.py:559-628, 720-817); merged per-case.
BASE_TRAIN_HP = dict(
    decoder_tf="always", decoder_tf_min=0.05, epochs=2,
    encoder_finetune_after=0, encoder_lr=0.0,
    lr_warmup_steps=0, opt="adam", momentum=0.9, nesterov=False,
    adam_b1=0.9, adam_b2=0.999, decoder_lr=5e-3, embedding_lr=8e-3,
    weight_decay=0.01, scheduler="step", milestones=[100], lr_gamma=0.5,
    plateau_patience=2, min_lr=0.0, cosine_iterations=4, cosine_multi=1,
    accumulate=1, train_loader_len=STEPS_PER_EPOCH,
    one_cycle_pct=0.4, one_cycle_div=25, one_cycle_fdiv=1e4)


def _train_cfg(cfg, hp):
    """Mirror the reference hparams into the SATConfig fields the production
    optimizer/scheduler read."""
    return cfg.replace(
        opt=hp["opt"], momentum=hp["momentum"], nesterov=hp["nesterov"],
        adam_b1=hp["adam_b1"], adam_b2=hp["adam_b2"],
        decoder_lr=hp["decoder_lr"], embedding_lr=hp["embedding_lr"],
        encoder_lr=hp["encoder_lr"], weight_decay=hp["weight_decay"],
        scheduler=hp["scheduler"], milestones=tuple(hp["milestones"]),
        lr_gamma=hp["lr_gamma"], min_lr=hp["min_lr"],
        lr_warmup_steps=hp["lr_warmup_steps"],
        cosine_iterations=hp["cosine_iterations"],
        cosine_multi=hp["cosine_multi"], accumulate=hp["accumulate"],
        epochs=hp["epochs"], encoder_finetune_after=0,
        plateau_patience=hp["plateau_patience"],
        one_cycle_pct=hp["one_cycle_pct"],
        one_cycle_div=hp["one_cycle_div"],
        one_cycle_fdiv=hp["one_cycle_fdiv"],
        train_loader_len=hp["train_loader_len"],
        grad_clip=hp.get("grad_clip", "value"),
        clip_value=hp.get("clip_value", 0.0))


def _lightning_shims(sat, opt):
    """The non-Lightning attributes the literal training_step /
    training_epoch_end touch (stub LightningModule provides none)."""
    sat.trainer = types.SimpleNamespace(global_step=0)
    sat.logger = types.SimpleNamespace(experiment=types.SimpleNamespace(
        add_scalar=lambda *a, **k: None))
    sat.optimizers = lambda: opt
    sat.global_step = 0
    sat.current_epoch = 0


def _clip_torch(sat, alg, value):
    """What Lightning does between backward and optimizer.step() for
    gradient_clip_algorithm/gradient_clip_val (reference train.py:273-275)."""
    if not value:
        return
    if alg == "value":
        torch.nn.utils.clip_grad_value_(sat.parameters(), value)
    else:
        torch.nn.utils.clip_grad_norm_(sat.parameters(), value)


def _decoder_sd(sat):
    return {k: v.detach().numpy().copy() for k, v in sat.state_dict().items()
            if not k.startswith("encoder.")}


def _grad_sd(sat):
    """Gradients in state_dict key layout (remove_duplicate=False keeps the
    weight-tying alias keys pointing at the shared grad, exactly like
    state_dict does for the shared weight)."""
    return {k: p.grad.detach().numpy().copy()
            for k, p in sat.named_parameters(remove_duplicate=False)
            if not k.startswith("encoder.") and p.grad is not None}


def _drive_reference(sat, batches, hp, n_steps=N_STEPS,
                     steps_per_epoch=STEPS_PER_EPOCH):
    """Run the literal reference training loop: training_step -> backward ->
    clip -> optimizer.step(), with training_epoch_end at epoch boundaries
    (exactly Lightning's call order for accumulate=1)."""
    opt = sat.configure_optimizers()
    _lightning_shims(sat, opt)
    losses, snaps, outputs = [], [], []
    for step in range(n_steps):
        sat.current_epoch = step // steps_per_epoch
        metrics = sat.training_step(batches[step], step)
        opt.zero_grad()
        metrics["loss"].backward()
        _clip_torch(sat, hp.get("grad_clip", "value"),
                    hp.get("clip_value", 0.0))
        opt.step()
        sat.global_step += 1
        sat.trainer.global_step += 1
        outputs.append({k: (v.detach() if torch.is_tensor(v) else v)
                        for k, v in metrics.items()})
        losses.append(float(metrics["loss"].detach()))
        snaps.append(_decoder_sd(sat))
        if (step + 1) % steps_per_epoch == 0:
            sat.training_epoch_end(outputs)   # per-epoch scheduler stepping
            outputs = []
    return losses, snaps


def _drive_sat_tpu(cfg, params, annots_j, batches, n_steps=N_STEPS,
                   steps_per_epoch=STEPS_PER_EPOCH):
    """Run the production pieces: jax.value_and_grad over the inline-loss
    scan + build_optimizer chain + apply_group_lrs + LRScheduler."""
    import jax
    import jax.numpy as jnp
    import optax
    from sat_tpu.models.sat import train_forward_loss
    from sat_tpu.train.optim import apply_group_lrs, build_optimizer
    from sat_tpu.train.schedules import LRScheduler

    full = {"decoder": params}
    tx, labels = build_optimizer(cfg, full)
    opt_state = tx.init(full)
    sched = LRScheduler(cfg, steps_per_epoch=steps_per_epoch)

    @jax.jit
    def step_fn(full, opt_state, caps, lens, lrs):
        def loss_fn(p):
            m = train_forward_loss(
                p["decoder"], cfg, jnp.repeat(annots_j, R, axis=0),
                caps, lens, jnp.asarray(1.0, jnp.float32),
                rng=jax.random.PRNGKey(0), train=False)
            return m["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(full)
        updates, new_opt = tx.update(grads, opt_state, full)
        updates = apply_group_lrs(updates, labels, lrs)
        return loss, optax.apply_updates(full, updates), new_opt

    losses, snaps = [], []
    for step in range(n_steps):
        caps, lens = batches[step]
        lrs = {k: jnp.asarray(v, jnp.float32)
               for k, v in sched.current_lrs(step).items()}
        loss, full, opt_state = step_fn(
            full, opt_state, jnp.asarray(caps, jnp.int32),
            jnp.asarray(lens, jnp.int32), lrs)
        sched.on_train_batch_end(step)
        if (step + 1) % steps_per_epoch == 0:
            sched.on_train_epoch_end(step // steps_per_epoch)
        losses.append(float(loss))
        snaps.append(jax.device_get(full["decoder"]))
    return losses, snaps


def _caption_batches(n_steps, seed0=1000):
    torch_batches, jax_batches = [], []
    for s in range(n_steps):
        caps, lens = make_captions(R, T, seed=seed0 + s)
        img = torch.zeros(1, 3, 8, 8)
        torch_batches.append((img, torch.from_numpy(caps).unsqueeze(0),
                              torch.from_numpy(lens).unsqueeze(0)))
        jax_batches.append((caps, lens))
    return torch_batches, jax_batches


def _assert_trees_close(ref_sd, got_tree, cfg, atol, step):
    import jax
    from sat_tpu.models.lightning_import import convert_decoder
    want = convert_decoder(ref_sd, cfg)
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got_tree)[0])
    assert set(flat_g) == {p for p, _ in flat_w}
    for path, w in flat_w:
        g = np.asarray(flat_g[path])
        d = float(np.abs(g - np.asarray(w)).max())
        assert d <= atol, (
            f"step {step} leaf {jax.tree_util.keystr(path)}: "
            f"max abs diff {d:.3e} > {atol:.1e}")


# ---------------------------------------------------------------------------
# Layer 1: gradient parity (backward through the literal reference loss)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tying", [False, True])
def test_gradients_match_reference_autograd(refmod, tying):
    """Per-leaf decoder gradients of the literal reference training_step loss
    (LabelSmoothing + doubly-stochastic term) vs jax.grad of the production
    inline-loss scan.  Weight tying pins the summed two-use gradient of the
    shared embedding/out-projection matrix."""
    import jax
    import jax.numpy as jnp
    from sat_tpu.models.lightning_import import convert_decoder
    from sat_tpu.models.sat import train_forward_loss

    sat, cfg, params, _, annots_j = make_pair(
        refmod, batch=1, weight_tying=tying, seed=11,
        extra_hparams=BASE_TRAIN_HP)
    caps, lens = make_captions(R, T, seed=7)
    batch = (torch.zeros(1, 3, 8, 8), torch.from_numpy(caps).unsqueeze(0),
             torch.from_numpy(lens).unsqueeze(0))
    lp, tp, al = sat.train_batch(batch, epsilon=1.0)
    loss = sat.criterion(lp.data, tp.data) + sat.hparams.att_gamma * (
        (1 - al.sum(dim=1)) ** 2).mean()
    loss.backward()
    ref_grads = convert_decoder(_grad_sd(sat), cfg)

    def loss_fn(p):
        m = train_forward_loss(
            p, cfg, jnp.repeat(annots_j, R, axis=0),
            jnp.asarray(caps, jnp.int32), jnp.asarray(lens, jnp.int32),
            jnp.asarray(1.0, jnp.float32), rng=jax.random.PRNGKey(0),
            train=False)
        return m["loss"]

    l, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(l) - float(loss.detach())) < 2e-4
    flat_r = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(jnp.asarray, ref_grads))[0])
    flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert set(flat_r) == {p for p, _ in flat_g}
    for path, g in flat_g:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[path]), atol=5e-7, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# Layer 2: optimizer-chain parity on identical fp64 synthetic gradients
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case", [
    dict(opt="adam", grad_clip="value", clip_value=0.02, lr_warmup_steps=3),
    dict(opt="adam", grad_clip="norm", clip_value=0.2, lr_warmup_steps=0),
    dict(opt="sgd", nesterov=True, momentum=0.9, grad_clip="norm",
         clip_value=0.2, lr_warmup_steps=3),
    dict(opt="sgd", nesterov=False, momentum=0.0, grad_clip="value",
         clip_value=0.02, lr_warmup_steps=0),
    dict(opt="adamw", grad_clip="norm", clip_value=0.2, lr_warmup_steps=2),
], ids=lambda c: f"{c['opt']}-{c['grad_clip']}-w{c['lr_warmup_steps']}")
def test_optimizer_update_rule_matches_torch_fp64(refmod, case):
    """Feed IDENTICAL synthetic fp64 gradient sequences to (a) the optimizer
    built by the reference's own configure_optimizers + the literal warmup
    scaling + Lightning clip, and (b) the production optax chain +
    LRScheduler; param trajectories must agree to fp64 noise.  Pins Adam eps
    placement, SGD wd-before-momentum, nesterov composition, clip/wd/LR
    ordering, per-group LRs, and warmup — with zero forward-pass noise."""
    import jax

    hp = dict(BASE_TRAIN_HP, **case)
    sat, cfg, params, _, _ = make_pair(refmod, batch=1, seed=31,
                                       extra_hparams=hp)
    cfg = _train_cfg(cfg, hp)

    opt = sat.configure_optimizers()
    sat = sat.double()          # in-place: the optimizer's param refs follow
    rng = np.random.default_rng(5)
    named = [(k, p) for k, p in sat.named_parameters()
             if not k.startswith("encoder.")]
    grad_seqs = [{k: rng.normal(0, 0.05, p.shape) *
                  (np.abs(rng.normal(0, 1, p.shape)) > 0.3)  # exact zeros too
                  for k, p in named} for _ in range(N_STEPS)]

    torch_snaps = []
    for step in range(N_STEPS):
        if step < hp["lr_warmup_steps"]:
            # the literal warmup arithmetic (model.py:618-622); the literal
            # CODE path is exercised by the full-trajectory layer below
            scale = min(1.0, float(step + 1) / hp["lr_warmup_steps"])
            for pg, init_lr in zip(opt.param_groups, sat.opt_init_lr):
                pg["lr"] = scale * init_lr
        opt.zero_grad()
        for k, p in named:
            # .copy() is load-bearing: from_numpy shares the numpy buffer
            # and clip_grad_* mutates p.grad IN PLACE — without the copy the
            # jax side would receive already-torch-clipped gradients (norm
            # clip is not idempotent, so it double-clips)
            p.grad = torch.from_numpy(grad_seqs[step][k].copy()).to(p.dtype)
        _clip_torch(sat, hp["grad_clip"], hp["clip_value"])
        opt.step()
        torch_snaps.append(_decoder_sd(sat))

    with jax.enable_x64(True):
        import jax.numpy as jnp
        import optax
        from sat_tpu.models.lightning_import import convert_decoder
        from sat_tpu.train.optim import apply_group_lrs, build_optimizer
        from sat_tpu.train.schedules import LRScheduler

        full = {"decoder": jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)}
        tx, labels = build_optimizer(cfg, full)
        opt_state = tx.init(full)
        sched = LRScheduler(cfg, steps_per_epoch=STEPS_PER_EPOCH)
        for step in range(N_STEPS):
            # alias keys for convert_decoder's tied-weight handling are not
            # needed (no tying in this layer); grads keyed like state_dict
            gsd = {k: grad_seqs[step][k] for k, _ in named}
            grads = {"decoder": jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float64),
                convert_decoder(gsd, cfg))}
            lrs = {k: jnp.asarray(v, jnp.float64)
                   for k, v in sched.current_lrs(step).items()}
            updates, opt_state = tx.update(grads, opt_state, full)
            updates = apply_group_lrs(updates, labels, lrs)
            full = optax.apply_updates(full, updates)
            sched.on_train_batch_end(step)
            _assert_trees_close(torch_snaps[step], full["decoder"], cfg,
                                atol=1e-11, step=step)


# ---------------------------------------------------------------------------
# Layer 3: full literal trajectory (training_step -> backward -> clip -> step)
# ---------------------------------------------------------------------------


TRAJ_CASES = [
    # adam + binding value-clip + warmup + MultiStepLR stepping mid-run
    dict(opt="adam", grad_clip="value", clip_value=0.02, lr_warmup_steps=2,
         scheduler="step", milestones=[1]),
    # sgd + nesterov momentum + binding norm-clip + per-epoch exp decay
    dict(opt="sgd", nesterov=True, momentum=0.9, grad_clip="norm",
         clip_value=0.2, scheduler="exp", lr_gamma=0.7, decoder_lr=5e-2,
         embedding_lr=8e-2),
    # adamw decoupled wd + warmup + per-batch cosine warm restarts
    dict(opt="adamw", grad_clip="norm", clip_value=0.2, lr_warmup_steps=2,
         scheduler="cosine", cosine_iterations=2, cosine_multi=1,
         min_lr=1e-4),
    # one_cycle per-batch schedule (forces warmup off, model.py:806)
    dict(opt="adam", scheduler="one_cycle", lr_warmup_steps=3),
]


@pytest.mark.parametrize("case", TRAJ_CASES,
                         ids=lambda c: f"{c['opt']}-{c['scheduler']}")
def test_training_trajectory_matches_reference(refmod, case):
    hp = dict(BASE_TRAIN_HP, **case)
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=1, seed=17,
                                              extra_hparams=hp)
    cfg = _train_cfg(cfg, hp)
    torch_batches, jax_batches = _caption_batches(N_STEPS)

    ref_losses, ref_snaps = _drive_reference(sat, torch_batches, hp)
    losses, snaps = _drive_sat_tpu(cfg, params, annots_j, jax_batches)

    for step in range(N_STEPS):
        assert abs(losses[step] - ref_losses[step]) < 3e-4, (
            step, losses[step], ref_losses[step])
        # 2e-4: cross-framework fp32 forward noise is ~1e-8 per gradient
        # leaf (measured), but Adam's m/sqrt(v) normalization amplifies it
        # for near-eps gradients (update ~ lr, i.e. 2.5e-3 here).  The fp64
        # synthetic-gradient layer above pins the update RULE at 1e-11;
        # this bound pins the end-to-end trajectory at <10% of one step.
        _assert_trees_close(ref_snaps[step], snaps[step], cfg,
                            atol=2e-4, step=step)


def test_trajectory_clip_actually_binds(refmod):
    """Guard the clip coverage claim: at these clip values the clips BIND on
    step 0 (otherwise the value/norm cases above test nothing)."""
    hp = dict(BASE_TRAIN_HP)
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=1, seed=17,
                                              extra_hparams=hp)
    torch_batches, _ = _caption_batches(N_STEPS)
    lp, tp, al = sat.train_batch(torch_batches[0], epsilon=1.0)
    loss = sat.criterion(lp.data, tp.data) + sat.hparams.att_gamma * (
        (1 - al.sum(dim=1)) ** 2).mean()
    loss.backward()
    gmax = max(float(p.grad.abs().max()) for _, p in sat.named_parameters()
               if p.grad is not None)
    gnorm = float(torch.sqrt(sum(p.grad.pow(2).sum()
                                 for _, p in sat.named_parameters()
                                 if p.grad is not None)))
    assert gmax > 0.02    # value-clip 0.02 binds
    assert gnorm > 0.2    # norm-clip 0.2 binds


def test_trajectory_weight_tying(refmod):
    """Tied embedding rides the decoder decay group (model.py:739-742 skips
    the embedding group under tying; the tied matrix gets weight decay via
    the output module) — trajectory must still track."""
    hp = dict(BASE_TRAIN_HP, opt="adam", grad_clip="value", clip_value=0.02)
    sat, cfg, params, _, annots_j = make_pair(
        refmod, batch=1, weight_tying=True, seed=19, extra_hparams=hp)
    cfg = _train_cfg(cfg, hp)
    torch_batches, jax_batches = _caption_batches(N_STEPS, seed0=2000)
    ref_losses, ref_snaps = _drive_reference(sat, torch_batches, hp)
    losses, snaps = _drive_sat_tpu(cfg, params, annots_j, jax_batches)
    for step in range(N_STEPS):
        assert abs(losses[step] - ref_losses[step]) < 3e-4
        _assert_trees_close(ref_snaps[step], snaps[step], cfg,
                            atol=1e-5, step=step)


def test_trajectory_per_group_lrs_diverge(refmod):
    """Sanity that the per-group LR machinery is actually exercised: with
    embedding_lr != decoder_lr the embedding's step-0 delta reflects ITS
    group's LR, not the decoder's."""
    hp = dict(BASE_TRAIN_HP, opt="sgd", momentum=0.0, nesterov=False,
              weight_decay=0.0, decoder_lr=1e-2, embedding_lr=4e-2)
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=1, seed=23,
                                              extra_hparams=hp)
    cfg = _train_cfg(cfg, hp)
    torch_batches, jax_batches = _caption_batches(1, seed0=3000)
    _, ref_snaps = _drive_reference(sat, torch_batches, hp, n_steps=1)
    _, snaps = _drive_sat_tpu(cfg, params, annots_j, jax_batches, n_steps=1)
    _assert_trees_close(ref_snaps[0], snaps[0], cfg, atol=1e-6, step=0)
    # plain SGD: delta = -lr * grad, so delta/grad recovers the group LR
    emb0 = np.asarray(params["embedding"])
    emb1 = np.asarray(snaps[0]["embedding"])
    moved = np.abs(emb1 - emb0).max()
    assert moved > 0
