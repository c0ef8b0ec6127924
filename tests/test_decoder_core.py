"""Unit tests for the decoder core against a tiny torch oracle.

Mirrors the reference's dev-harness strategy (SURVEY.md §4): each mechanism is
checked in isolation against a trusted implementation — here torch(cpu) modules
built to the reference's exact equations (model.py:66-131)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from sat_tpu.config import SATConfig
from sat_tpu.models import decoder as D
from sat_tpu.models.sat import train_forward, sat_loss, repeat_annotations
from sat_tpu.ops.label_smoothing import label_smoothing_loss
from sat_tpu.ops.lstm import init_lstm_params, lstm_stack_step


def small_cfg(**kw):
    base = dict(vocab_size=23, embed_dim=12, encoder_dim=10, attention_dim=8,
                decoder_dim=16, decoder_layers=1, deep_output=True,
                dropout=0.0, embedding_dropout=0.0)
    base.update(kw)
    return SATConfig(**base)


def test_lstm_cell_matches_torch():
    rng = jax.random.PRNGKey(0)
    in_dim, hidden, layers, b = 14, 16, 2, 5
    params = init_lstm_params(rng, in_dim, hidden, layers)

    lstm = torch.nn.LSTM(input_size=in_dim, hidden_size=hidden, num_layers=layers, bias=True)
    with torch.no_grad():
        for l in range(layers):
            getattr(lstm, f"weight_ih_l{l}").copy_(torch.tensor(np.array(params[f"layer_{l}"]["w_ih"]).T))
            getattr(lstm, f"weight_hh_l{l}").copy_(torch.tensor(np.array(params[f"layer_{l}"]["w_hh"]).T))
            getattr(lstm, f"bias_ih_l{l}").copy_(torch.tensor(np.array(params[f"layer_{l}"]["b_ih"])))
            getattr(lstm, f"bias_hh_l{l}").copy_(torch.tensor(np.array(params[f"layer_{l}"]["b_hh"])))

    x = np.random.default_rng(1).normal(size=(b, in_dim)).astype(np.float32)
    h0 = np.random.default_rng(2).normal(size=(layers, b, hidden)).astype(np.float32)
    c0 = np.random.default_rng(3).normal(size=(layers, b, hidden)).astype(np.float32)

    h_j, c_j = lstm_stack_step(jnp.array(x), jnp.array(h0), jnp.array(c0), params)
    with torch.no_grad():
        _, (h_t, c_t) = lstm(torch.tensor(x).unsqueeze(0),
                             (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.array(h_j), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.array(c_j), c_t.numpy(), atol=1e-5)


def test_soft_attention_matches_reference_equations():
    """alpha = softmax(f_att(tanh(We a + Wd h)) / sqrt(L)); zt = sum alpha*a
    (reference: model.py:94-109)."""
    cfg = small_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, L = 4, 9
    annots = rng.normal(size=(b, L, cfg.encoder_dim)).astype(np.float32)
    hidden = rng.normal(size=(b, cfg.decoder_dim)).astype(np.float32)

    att_enc = D.attention_precompute(params, jnp.array(annots))
    zt, alpha = D.soft_attention(params, att_enc, jnp.array(annots), jnp.array(hidden))

    we = np.array(params["att_enc"]["w"])
    wd = np.array(params["att_dec"]["w"])
    wf = np.array(params["f_att"]["w"])
    att = np.tanh(annots @ we + (hidden @ wd)[:, None, :]) @ wf
    att = att[..., 0] * L ** -0.5
    expect_alpha = np.exp(att - att.max(-1, keepdims=True))
    expect_alpha /= expect_alpha.sum(-1, keepdims=True)
    expect_zt = (annots * expect_alpha[..., None]).sum(1)
    np.testing.assert_allclose(np.array(alpha), expect_alpha, atol=1e-5)
    np.testing.assert_allclose(np.array(zt), expect_zt, atol=1e-5)
    np.testing.assert_allclose(np.array(alpha).sum(-1), 1.0, atol=1e-6)


def test_init_lstm_shapes_and_mean():
    cfg = small_cfg(decoder_layers=2)
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    annots = jnp.ones((3, 7, cfg.encoder_dim))
    h, c = D.init_lstm_state(params, annots, cfg)
    assert h.shape == (2, 3, cfg.decoder_dim)
    assert c.shape == (2, 3, cfg.decoder_dim)


def test_label_smoothing_vs_torch_cross_entropy():
    """smoothing=0 == cross entropy (reference: dev/dev_label_smoothing.py:18-23)."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(30, 17)).astype(np.float32)
    targets = rng.integers(0, 17, size=(30,))
    mask = np.ones(30, bool)
    got = label_smoothing_loss(jnp.array(logits), jnp.array(targets), jnp.array(mask), 0.0)
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(targets)).item()
    assert abs(float(got) - want) < 1e-5


def test_label_smoothing_masked_equals_packed():
    """Masked mean == packed mean over only the first `length` positions."""
    rng = np.random.default_rng(1)
    n, t, v = 6, 5, 11
    logits = rng.normal(size=(n, t, v)).astype(np.float32)
    targets = rng.integers(1, v, size=(n, t))
    lengths = np.array([5, 3, 1, 4, 2, 5])
    mask = lengths[:, None] > np.arange(t)[None, :]
    got = label_smoothing_loss(jnp.array(logits), jnp.array(targets),
                               jnp.array(mask), 0.1)
    # "packed" oracle: gather valid positions explicitly
    flat_l = np.concatenate([logits[i, :lengths[i]] for i in range(n)])
    flat_t = np.concatenate([targets[i, :lengths[i]] for i in range(n)])
    lp = torch.log_softmax(torch.tensor(flat_l), dim=-1)
    nll = -lp.gather(1, torch.tensor(flat_t)[:, None])[:, 0]
    smooth = -lp.mean(-1)
    want = (0.9 * nll + 0.1 * smooth).mean().item()
    assert abs(float(got) - want) < 1e-5


def test_deep_output_weight_tying():
    cfg = small_cfg(weight_tying=True, deep_output=True)
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    assert "out_proj" not in params
    x = jnp.ones((2, cfg.embed_dim))
    h = jnp.ones((2, cfg.decoder_dim))
    z = jnp.ones((2, cfg.encoder_dim))
    logits = D.deep_output(params, cfg, x, h, z)
    assert logits.shape == (2, cfg.vocab_size)


def test_embed_norm_renormalizes():
    cfg = small_cfg(embed_norm=1.0)
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    vecs = D.embed_tokens(params, jnp.arange(cfg.vocab_size), cfg)
    norms = np.linalg.norm(np.array(vecs), axis=-1)
    assert (norms <= 1.0 + 1e-5).all()
    # pad row stays zero
    np.testing.assert_allclose(np.array(vecs)[0], 0.0)


def test_train_forward_shapes_and_masking():
    cfg = small_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, r, total_t, L = 2, 3, 8, 6
    annots = jnp.array(rng.normal(size=(b, L, cfg.encoder_dim)).astype(np.float32))
    annots_rep = repeat_annotations(annots, r)
    caps = rng.integers(1, cfg.vocab_size, size=(b * r, total_t)).astype(np.int32)
    lengths = np.array([7, 3, 5, 2, 6, 4], np.int32)
    logits, targets, alphas = train_forward(
        params, cfg, annots_rep, jnp.array(caps), jnp.array(lengths),
        jnp.array(1.0), jax.random.PRNGKey(1))
    assert logits.shape == (b * r, total_t - 1, cfg.vocab_size)
    assert targets.shape == (b * r, total_t - 1)
    assert alphas.shape == (b * r, total_t - 1, L)
    # alphas at masked (inactive) steps are exactly zero
    a = np.array(alphas)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(a[i, l:], 0.0)
        np.testing.assert_allclose(a[i, :l].sum(-1), 1.0, atol=1e-5)
    metrics = sat_loss(cfg, logits, targets, jnp.array(lengths), alphas)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("epsilon", [1.0, 0.0])
def test_grouped_loss_equals_flat_loss(epsilon):
    """train_forward_loss_grouped (annotations (B,L,D), captions (B,R,T) —
    the production train step) must equal repeat+flatten+train_forward_loss,
    including with argmax feedback (epsilon=0) and multi-image batches where
    the reference-parity init reshape mixes rows."""
    from sat_tpu.models.sat import (train_forward_loss,
                                    train_forward_loss_grouped)
    cfg = small_cfg(label_smoothing=0.1, att_gamma=1.0)
    params = D.init_decoder_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    b, r, total_t, L = 3, 5, 9, 6
    annots = jnp.array(rng.normal(size=(b, L, cfg.encoder_dim))
                       .astype(np.float32))
    caps = rng.integers(1, cfg.vocab_size, size=(b, r, total_t)).astype(np.int32)
    lens = rng.integers(2, total_t - 1, size=(b, r)).astype(np.int32)

    flat = train_forward_loss(
        params, cfg, repeat_annotations(annots, r),
        jnp.asarray(caps.reshape(b * r, total_t)),
        jnp.asarray(lens.reshape(b * r)), jnp.asarray(epsilon),
        rng=jax.random.PRNGKey(7), train=False)
    grouped = train_forward_loss_grouped(
        params, cfg, annots, jnp.asarray(caps), jnp.asarray(lens),
        jnp.asarray(epsilon), rng=jax.random.PRNGKey(7), train=False)
    for k in ("loss", "ce_loss", "att_loss", "accuracy"):
        assert abs(float(flat[k]) - float(grouped[k])) < 1e-5, k


def test_grouped_loss_equals_flat_loss_fuzz():
    """Shape/config fuzz of the grouped==flat equivalence (the production
    train path): random (B, R, T, L) plus the config variants that change
    the step math — multi-layer LSTM, weight tying, embed max_norm, no
    deep_output — must all agree with the repeat+flatten reference path."""
    from sat_tpu.models.sat import (train_forward_loss,
                                    train_forward_loss_grouped)
    rng = np.random.default_rng(0xF02)
    variants = [
        dict(),
        dict(decoder_layers=2),
        dict(weight_tying=True, embed_norm=1.0),
        dict(deep_output=False),
        dict(label_smoothing=0.3, att_gamma=0.5),
    ]
    for i, kw in enumerate(variants):
        cfg = small_cfg(**{"label_smoothing": 0.1, "att_gamma": 1.0, **kw})
        params = D.init_decoder_params(jax.random.PRNGKey(100 + i), cfg)
        b = int(rng.integers(1, 5))
        r = int(rng.integers(1, 6))
        total_t = int(rng.integers(4, 12))
        L = int(rng.integers(2, 9))
        eps = float(rng.choice([0.0, 0.5, 1.0]))
        annots = jnp.array(rng.normal(size=(b, L, cfg.encoder_dim))
                           .astype(np.float32))
        caps = rng.integers(1, cfg.vocab_size,
                            size=(b, r, total_t)).astype(np.int32)
        lens = rng.integers(2, total_t, size=(b, r)).astype(np.int32)
        key = jax.random.PRNGKey(200 + i)
        flat = train_forward_loss(
            params, cfg, repeat_annotations(annots, r),
            jnp.asarray(caps.reshape(b * r, total_t)),
            jnp.asarray(lens.reshape(b * r)), jnp.asarray(eps),
            rng=key, train=False)
        grouped = train_forward_loss_grouped(
            params, cfg, annots, jnp.asarray(caps), jnp.asarray(lens),
            jnp.asarray(eps), rng=key, train=False)
        for k in ("loss", "ce_loss", "att_loss", "accuracy"):
            assert abs(float(flat[k]) - float(grouped[k])) < 1e-5, (i, kw, k)


def test_teacher_forcing_feedback_changes_outputs():
    """epsilon=0 must route argmax feedback after step 2 (model.py:518-523)."""
    cfg = small_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, total_t, L = 4, 10, 5
    annots = jnp.array(rng.normal(size=(n, L, cfg.encoder_dim)).astype(np.float32))
    caps = jnp.array(rng.integers(1, cfg.vocab_size, size=(n, total_t)).astype(np.int32))
    lengths = jnp.full((n,), total_t - 1, jnp.int32)
    lg1, _, _ = train_forward(params, cfg, annots, caps, lengths,
                              jnp.array(1.0), jax.random.PRNGKey(1))
    lg0, _, _ = train_forward(params, cfg, annots, caps, lengths,
                              jnp.array(0.0), jax.random.PRNGKey(1))
    # First 3+1 steps identical (steps 0..2 forced GT; step 3 input differs)
    np.testing.assert_allclose(np.array(lg1[:, :3]), np.array(lg0[:, :3]), atol=1e-6)
    assert not np.allclose(np.array(lg1[:, 4:]), np.array(lg0[:, 4:]))


def test_tf_schedules():
    """All four schedules behave per reference model.py:565-582
    (prototype dev/dev_tf_schedule.py)."""
    from sat_tpu.train.tf_schedule import teacher_forcing_epsilon
    cfg = small_cfg(epochs=20, decoder_tf="always")
    assert teacher_forcing_epsilon(cfg, 5) == 1.0
    cfg = small_cfg(epochs=20, decoder_tf="linear", decoder_tf_min=0.5)
    assert abs(teacher_forcing_epsilon(cfg, 0) - 1.0) < 1e-9
    assert abs(teacher_forcing_epsilon(cfg, 20) - 0.5) < 1e-9
    cfg = small_cfg(epochs=20, decoder_tf="exp", decoder_tf_min=0.5)
    assert abs(teacher_forcing_epsilon(cfg, 20) - 0.5) < 1e-9
    cfg = small_cfg(epochs=20, decoder_tf="inv_sigmoid", decoder_tf_min=0.5)
    eps = [teacher_forcing_epsilon(cfg, e) for e in range(21)]
    assert all(a >= b for a, b in zip(eps, eps[1:]))  # monotone decreasing
    assert eps[0] > 0.99
    cfg = small_cfg(epochs=20, decoder_tf=None)
    assert teacher_forcing_epsilon(cfg, 3) == 0.0


def test_dropout_masks_are_independent(monkeypatch):
    """Embedding dropout and deep-output dropout must draw from DIFFERENT
    keys per step (reference: model.py:527 and model.py:128 are separate
    nn.Dropout modules).  A shared key makes the two masks bit-identical
    whenever the shapes coincide (embed_dim == deep-output width)."""
    import sat_tpu.models.sat as sat_mod
    import sat_tpu.models.decoder as dec_mod

    cfg = small_cfg(dropout=0.5, embedding_dropout=0.5)
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, r, total_t, L = 2, 2, 6, 4
    annots = jnp.array(rng.normal(size=(b, L, cfg.encoder_dim)).astype(np.float32))
    caps = jnp.array(rng.integers(1, cfg.vocab_size,
                                  size=(b * r, total_t)).astype(np.int32))
    lengths = jnp.array(np.full(b * r, total_t - 1, np.int32))

    seen = []
    orig = dec_mod._dropout

    def spy(x, rate, key):
        if key is not None:
            seen.append(np.asarray(jax.random.key_data(key)).tobytes())
        return orig(x, rate, key)

    monkeypatch.setattr(dec_mod, "_dropout", spy)
    monkeypatch.setattr(sat_mod, "_dropout", spy)
    with jax.disable_jit():
        train_forward(params, cfg, repeat_annotations(annots, r), caps,
                      lengths, jnp.array(1.0), jax.random.PRNGKey(3),
                      train=True)
    # 2 draws per step (embedding + deep output) + 1 init-state draw
    n_steps = total_t - 1
    assert len(seen) == 2 * n_steps + 1
    assert len(set(seen)) == len(seen), "dropout keys reused across draws"
