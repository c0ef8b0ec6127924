"""In-step microbatch chunking (`--microbatch`): the jitted train step scans
gradient computation over batch/microbatch chunks so the activation working
set stays chunk-sized (the b64->b256 cache cliff, EXPERIMENTS.md "Training
step") while the optimizer update still happens once per full batch.

Unlike the reference's Lightning accumulate_grad_batches (train.py:266-287 via
--accumulate/optax.MultiSteps), the chunk objectives are re-weighted by their
masked-token counts so the summed gradients reproduce the FULL-batch loss
exactly — pinned here against the unchunked step on a BatchNorm-free encoder
(squeezenet; BN is the one op whose per-chunk statistics legitimately differ
under any accumulation scheme)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def _make_batch(rng, b, s, v, n_refs=5, T=10):
    lens = rng.integers(3, T - 1, (b, n_refs)).astype(np.int32)
    caps = np.zeros((b, n_refs, T), np.int32)
    caps[..., 0] = v - 2
    for i in range(b):
        for r in range(n_refs):
            L = int(lens[i, r])
            caps[i, r, 1:L] = rng.integers(1, v - 4, L - 1)
            caps[i, r, L] = v - 1
    images = rng.integers(0, 256, (b, s, s, 3)).astype(np.uint8)
    return {"images": jnp.asarray(images), "captions": jnp.asarray(caps),
            "lengths": jnp.asarray(lens)}


def _trainer(synth_json, tmp_path, tag, **kw):
    # SGD for the exact-equivalence tests: Adam's first-step update is
    # g/sqrt(g^2) — a sign function that amplifies fp summation-order noise
    # on near-zero gradients into O(lr) param differences.  SGD updates are
    # linear in the gradient, so tolerances measure the actual grad delta.
    base = dict(json=synth_json, batch=8, epochs=1, input_size=32,
                encoder_arch="squeezenet1_1", encoder_dim=24,
                embed_dim=16, attention_dim=16, decoder_dim=32,
                decoder_tf="always", deep_output=True, att_gamma=1.0,
                dropout=0.0, embedding_dropout=0.0, label_smoothing=0.1,
                opt="sgd", momentum=0.0, mesh_shape=(-1,), seed=0)
    base.update(kw)
    return Trainer(SATConfig(**base), log_root=str(tmp_path / tag))


@pytest.fixture(scope="module")
def synth_json(tmp_path_factory):
    from sat_tpu.data.preprocess import make_synthetic_dataset
    out = tmp_path_factory.mktemp("ds_mb")
    return make_synthetic_dataset(str(out), n_train=16, n_val=8, n_test=8,
                                  image_size=32, max_cap_length=8)


def _one_step(trainer, batch, train_encoder=True):
    lrs = {k: jnp.asarray(1e-3, jnp.float32)
           for k in ("decoder", "embedding", "encoder")}
    variables, opt_state, metrics = trainer._jit_train_step(
        trainer.variables, trainer.opt_state, batch,
        lrs, jnp.asarray(1.0, jnp.float32), jax.random.PRNGKey(3),
        train_encoder=train_encoder)
    return jax.device_get(variables["params"]), jax.device_get(metrics)


def test_microbatch_step_matches_full_batch(synth_json, tmp_path):
    """microbatch=2 over batch=8 must reproduce the unchunked update exactly
    (fp32, no dropout, epsilon=1 so the per-chunk TF rng split is inert;
    squeezenet has no BatchNorm so even the encoder path is deterministic)."""
    rng = np.random.default_rng(7)
    t_full = _trainer(synth_json, tmp_path, "full")
    t_mb = _trainer(synth_json, tmp_path, "mb", microbatch=2)
    batch = _make_batch(rng, 8, 32, t_full.cfg.vocab_size)

    p_full, m_full = _one_step(t_full, batch)
    p_mb, m_mb = _one_step(t_mb, batch)

    assert np.isfinite(m_full["loss"]) and np.isfinite(m_mb["loss"])
    np.testing.assert_allclose(m_mb["loss"], m_full["loss"], rtol=2e-5)
    np.testing.assert_allclose(m_mb["ce_loss"], m_full["ce_loss"], rtol=2e-5)
    np.testing.assert_allclose(m_mb["att_loss"], m_full["att_loss"], rtol=2e-5)
    np.testing.assert_allclose(m_mb["accuracy"], m_full["accuracy"], rtol=2e-5)

    flat_mb = dict(jax.tree_util.tree_leaves_with_path(p_mb))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_full):
        np.testing.assert_allclose(
            flat_mb[path], leaf, rtol=5e-5, atol=5e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_microbatch_frozen_encoder_matches(synth_json, tmp_path):
    """Same equivalence on the frozen-encoder (stop_gradient) recompile
    boundary the trainer uses before encoder_finetune_after."""
    rng = np.random.default_rng(11)
    t_full = _trainer(synth_json, tmp_path, "full_f")
    t_mb = _trainer(synth_json, tmp_path, "mb_f", microbatch=4)
    batch = _make_batch(rng, 8, 32, t_full.cfg.vocab_size)
    p_full, m_full = _one_step(t_full, batch, train_encoder=False)
    p_mb, m_mb = _one_step(t_mb, batch, train_encoder=False)
    np.testing.assert_allclose(m_mb["loss"], m_full["loss"], rtol=2e-5)
    a = jax.tree_util.tree_leaves(p_full)
    b = jax.tree_util.tree_leaves(p_mb)
    for x, y in zip(a, b):
        np.testing.assert_allclose(y, x, rtol=5e-5, atol=5e-6)


def test_microbatch_batchnorm_arch_trains(synth_json, tmp_path):
    """BN archs run the chunked path too (per-chunk normalization — the
    standard accumulation semantics); stats must update and loss stay
    finite + close to the unchunked value."""
    rng = np.random.default_rng(13)
    t_full = _trainer(synth_json, tmp_path, "bn_full",
                      encoder_arch="shufflenet_v2_x0_5", encoder_dim=32)
    t_mb = _trainer(synth_json, tmp_path, "bn_mb", microbatch=4,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=32)
    batch = _make_batch(rng, 8, 32, t_full.cfg.vocab_size)
    bs_before = jax.device_get(t_mb.variables["state"]["batch_stats"])

    lrs = {k: jnp.asarray(1e-3, jnp.float32)
           for k in ("decoder", "embedding", "encoder")}
    v_full, _, m_full = t_full._jit_train_step(
        t_full.variables, t_full.opt_state, batch, lrs,
        jnp.asarray(1.0, jnp.float32), jax.random.PRNGKey(3),
        train_encoder=True)
    v_mb, _, m_mb = t_mb._jit_train_step(
        t_mb.variables, t_mb.opt_state, batch, lrs,
        jnp.asarray(1.0, jnp.float32), jax.random.PRNGKey(3),
        train_encoder=True)
    lf, lm = float(m_full["loss"]), float(m_mb["loss"])
    assert np.isfinite(lf) and np.isfinite(lm)
    assert abs(lf - lm) / abs(lf) < 0.05  # BN chunk stats shift only
    bs_after = jax.device_get(v_mb["state"]["batch_stats"])
    changed = [not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(bs_before),
        jax.tree_util.tree_leaves(bs_after))]
    assert any(changed)


def test_microbatch_full_fit_runs(synth_json, tmp_path):
    """The whole fit() loop (loader, metric flush, validation, checkpoint)
    works with chunking on."""
    t = _trainer(synth_json, tmp_path, "fit", microbatch=4, epochs=1,
                 val_interval=1, val_beamk=2, val_max_len=6)
    metrics = t.fit()
    assert np.isfinite(metrics["bleu4"])


def test_invalid_microbatch_rejected(synth_json, tmp_path):
    """A microbatch that doesn't divide the batch (or isn't smaller than it)
    must fail loudly at Trainer construction — the in-step gate would
    otherwise silently run the full unchunked batch, defeating the flag's
    purpose as the OOM-avoidance lever."""
    for bad in (3, 8, 16):
        with pytest.raises(ValueError, match="microbatch"):
            _trainer(synth_json, tmp_path, f"bad{bad}", microbatch=bad)


def test_abandoned_epoch_reaps_upload_thread(synth_json, tmp_path):
    """Breaking out of an epoch early (max_batches / a step exception) must
    not leave the upload producer thread blocked on its queue: EVERY put in
    the producer — including the final _END — checks the stop event, so the
    generator's close() reaps the thread promptly instead of leaking it (and
    the 2-3 device batches it holds) for the life of the process."""
    import threading
    import time as _time
    from sat_tpu.data.preprocess import make_synthetic_dataset
    # 64 imgs / batch 8 -> 8 batches (batch must stay divisible by the
    # 8-device test mesh): with max_batches=1 the producer is still deep in
    # the epoch (blocked on a full queue) when the consumer walks away
    big = make_synthetic_dataset(str(tmp_path / "reap_ds"), n_train=64,
                                 n_val=8, n_test=8, image_size=32,
                                 max_cap_length=8)
    t = _trainer(big, tmp_path, "reap", microbatch=0)
    before = {th.ident for th in threading.enumerate()}
    t.train_epoch(max_batches=1)
    deadline = _time.time() + 20
    while _time.time() < deadline:
        leftover = [th for th in threading.enumerate()
                    if th.ident not in before and th.is_alive()]
        if not leftover:
            break
        _time.sleep(0.1)
    assert not leftover, f"leaked threads: {leftover}"
