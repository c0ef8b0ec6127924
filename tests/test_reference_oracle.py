"""Literal-reference oracle harness (VERDICT r1 next-round item #2).

Executes the reference's OWN code — /root/reference/model.py SAT.train_batch
(model.py:474-557) and SAT.forward beam search (model.py:237-472) — as the
oracle, instead of test-local re-implementations of its math.  This retires
the "shared misreading" risk: if sat_tpu and a hand-written torch oracle both
misread model.py the same way, only running model.py itself can catch it.

Shared harness (stubs, paired-model construction, the InitLSTM layout-quirk
notes) lives in tests/_reference_harness.py — also used by
test_train_trajectory.py (the r2 #1 backward+optimizer trajectory suite).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import (ENC_D, GRID_H, GRID_W, V,  # noqa: E402
                                load_reference, make_captions, make_pair)

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier

_captions = make_captions


@pytest.fixture(scope="module")
def refmod():
    """Import the reference's model.py + util.py (the REAL files)."""
    model, restore = load_reference()
    try:
        yield model
    finally:
        restore()


# ---------------------------------------------------------------------------
# train_batch parity (reference model.py:474-557 actually executed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("epsilon", [1.0, 0.0])
@pytest.mark.parametrize("layers", [1, 2])
def test_train_batch_logits_and_loss_match_reference(refmod, epsilon, layers):
    """Per-timestep logits/alphas + LabelSmoothing/att/accuracy from the
    reference's own train_batch + training_step math (model.py:474-557,
    588-597).  B=1 with 5 reference captions — the regime where the
    reference's InitLSTM reshape is row-independent (see module docstring);
    epsilon=0 exercises the argmax-feedback scheduled-sampling path."""
    import jax
    import jax.numpy as jnp
    from sat_tpu.models.sat import train_forward, sat_loss

    R, T = 5, 9
    sat, cfg, params, annots_t, annots_j = make_pair(
        refmod, batch=1, decoder_layers=layers, seed=11)
    caps, lens = _captions(R, T, seed=7)

    img = torch.zeros(1, 3, 8, 8)
    batch = (img, torch.from_numpy(caps).unsqueeze(0),
             torch.from_numpy(lens).unsqueeze(0))
    with torch.no_grad():
        logits_packed, targets_packed, ref_alphas = sat.train_batch(
            batch, epsilon=epsilon)
        ref_loss = sat.criterion(logits_packed.data, targets_packed.data)
        ref_loss = ref_loss + sat.hparams.att_gamma * (
            (1 - ref_alphas.sum(dim=1)) ** 2).mean()
        ref_pred = torch.argmax(logits_packed.data, dim=1)
        ref_acc = (torch.sum(ref_pred == targets_packed.data)
                   / ref_pred.shape[0])
        ref_logits, ref_out_lens = torch.nn.utils.rnn.pad_packed_sequence(
            logits_packed, batch_first=True, total_length=T - 1)

    ann_rep = jnp.repeat(annots_j, R, axis=0)          # model.py:487
    logits, targets, alphas = train_forward(
        params, cfg, ann_rep, jnp.asarray(caps, jnp.int32),
        jnp.asarray(lens, jnp.int32), jnp.asarray(epsilon, jnp.float32),
        rng=jax.random.PRNGKey(0), train=False)
    m = sat_loss(cfg, logits, targets, jnp.asarray(lens, jnp.int32), alphas)

    mask = lens[:, None] > np.arange(T - 1)[None, :]
    got = np.asarray(logits)[mask]
    want = ref_logits.numpy()[mask]
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(alphas), ref_alphas.numpy(),
                               atol=1e-5, rtol=1e-4)
    assert abs(float(m["loss"]) - float(ref_loss)) < 2e-4
    assert abs(float(m["accuracy"]) - float(ref_acc)) < 1e-6


def test_train_forward_loss_matches_reference_loss(refmod):
    """The inline-loss production scan (train_forward_loss — the path the
    jitted train step actually runs) against the reference's loss value."""
    import jax
    import jax.numpy as jnp
    from sat_tpu.models.sat import train_forward_loss

    R, T = 5, 9
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=1, seed=3)
    caps, lens = _captions(R, T, seed=5)
    batch = (torch.zeros(1, 3, 8, 8), torch.from_numpy(caps).unsqueeze(0),
             torch.from_numpy(lens).unsqueeze(0))
    with torch.no_grad():
        lp, tp, ref_alphas = sat.train_batch(batch, epsilon=1.0)
        ref_loss = sat.criterion(lp.data, tp.data) + sat.hparams.att_gamma * (
            (1 - ref_alphas.sum(dim=1)) ** 2).mean()

    m = train_forward_loss(params, cfg, jnp.repeat(annots_j, R, axis=0),
                           jnp.asarray(caps, jnp.int32),
                           jnp.asarray(lens, jnp.int32),
                           jnp.asarray(1.0, jnp.float32),
                           rng=jax.random.PRNGKey(0), train=False)
    assert abs(float(m["loss"]) - float(ref_loss)) < 2e-4

    # the GROUPED production path (annotations never repeated — the b256 HBM
    # fix) must hit the same reference loss
    from sat_tpu.models.sat import train_forward_loss_grouped
    mg = train_forward_loss_grouped(
        params, cfg, annots_j, jnp.asarray(caps, jnp.int32)[None],
        jnp.asarray(lens, jnp.int32)[None], jnp.asarray(1.0, jnp.float32),
        rng=jax.random.PRNGKey(0), train=False)
    assert abs(float(mg["loss"]) - float(ref_loss)) < 2e-4
    assert abs(float(mg["accuracy"]) - float(m["accuracy"])) < 1e-6


# ---------------------------------------------------------------------------
# forward() beam-search parity (reference model.py:237-472 actually executed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rescore", [None, "LN", "WR", "BAR"])
def test_beam_search_matches_reference_forward(refmod, rescore):
    """Captions, scores, alphas, perplexity from the reference's own
    per-image shrinking beam search vs the batched static-shape search."""
    from sat_tpu.decode.api import caption_from_annotations

    B, K, S = 3, 3, 12
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=B, seed=21)
    img = torch.zeros(B, 3, 8, 8)
    with torch.no_grad():
        ref_caps, ref_scores, ref_alphas, ref_ppl = sat.caption(
            img, beamk=K, max_gen_length=S, temperature=1.0,
            sample_method="beam", rescore_method=rescore,
            rescore_reward=0.5, return_all=True)

    caps, scores, alphas, ppl = caption_from_annotations(
        params, cfg, annots_j, (GRID_H, GRID_W), beamk=K, max_gen_length=S,
        temperature=1.0, sample_method="beam", rescore_method=rescore,
        rescore_reward=0.5, return_all=True)

    for i in range(B):
        assert len(caps[i]) == len(ref_caps[i]) == K
        for j in range(K):
            assert caps[i][j] == list(ref_caps[i][j]), (i, j, rescore)
            # cumulative logprob over up to S steps: fp32 summation-order
            # noise scales with |s|
            assert abs(scores[i][j] - ref_scores[i][j]) < (
                1e-3 + 5e-4 * abs(ref_scores[i][j]))
            assert abs(ppl[i][j] - ref_ppl[i][j]) < 1e-2 * max(
                1.0, abs(ref_ppl[i][j]))
            ra = ref_alphas[i][j].numpy()
            np.testing.assert_allclose(alphas[i][j], ra, atol=1e-4, rtol=1e-3)


def test_beam_search_best_selection_matches_reference(refmod):
    """return_all=False best-of-beam selection (model.py:462-467)."""
    from sat_tpu.decode.api import caption_from_annotations

    B, K, S = 4, 4, 10
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=B, seed=33)
    with torch.no_grad():
        ref_caps, ref_scores, _, _ = sat.caption(
            torch.zeros(B, 3, 8, 8), beamk=K, max_gen_length=S,
            rescore_method="LN", return_all=False)
    caps, scores, _, _ = caption_from_annotations(
        params, cfg, annots_j, (GRID_H, GRID_W), beamk=K, max_gen_length=S,
        rescore_method="LN", return_all=False)
    for i in range(B):
        assert caps[i] == list(ref_caps[i])
        assert abs(scores[i] - ref_scores[i]) < 1e-3


def test_temperature_list_cycling_matches_reference(refmod):
    """Per-step temperature cycling temperature[step % len] (model.py:292,
    330) against the reference's loop."""
    from sat_tpu.decode.api import caption_from_annotations

    B, K, S = 2, 3, 10
    temps = [0.8, 1.15]
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=B, seed=41)
    with torch.no_grad():
        ref_caps, ref_scores, _, _ = sat.caption(
            torch.zeros(B, 3, 8, 8), beamk=K, max_gen_length=S,
            temperature=temps, rescore_method="LN", return_all=True)
    caps, scores, _, _ = caption_from_annotations(
        params, cfg, annots_j, (GRID_H, GRID_W), beamk=K, max_gen_length=S,
        temperature=temps, rescore_method="LN", return_all=True)
    for i in range(B):
        for j in range(K):
            assert caps[i][j] == list(ref_caps[i][j])
            assert abs(scores[i][j] - ref_scores[i][j]) < 1e-3


def test_multinomial_masking_invariants_match_reference(refmod):
    """Multinomial sampling is stochastic (torch.multinomial vs Gumbel
    top-k draw different bits), so exact tokens can't match; assert the
    reference's own masked-sampling invariants hold identically on both:
    no <START>/<PAD>/<UNK> ever sampled, step-0 masks <END>, every caption
    terminates within max_gen_length."""
    from sat_tpu.decode.api import caption_from_annotations
    import jax

    B, K, S = 2, 3, 10
    sat, cfg, params, _, annots_j = make_pair(refmod, batch=B, seed=55)
    torch.manual_seed(0)
    with torch.no_grad():
        ref_caps, _, _, _ = sat.caption(
            torch.zeros(B, 3, 8, 8), beamk=K, max_gen_length=S,
            sample_method="multinomial", return_all=True)
    caps, _, _, _ = caption_from_annotations(
        params, cfg, annots_j, (GRID_H, GRID_W), beamk=K, max_gen_length=S,
        sample_method="multinomial", return_all=True,
        rng=jax.random.PRNGKey(0))

    def check(all_caps, to_list):
        for i in range(B):
            assert len(all_caps[i]) == K
            for cap in all_caps[i]:
                toks = to_list(cap)
                assert len(toks) <= S + 1
                assert 2 not in toks and 0 not in toks      # <START>/<PAD>
                if toks:
                    assert toks[0] != 3                     # step-0 <END> mask

    check(ref_caps, lambda c: list(c))
    check(caps, lambda c: list(c))


@pytest.mark.parametrize("layers,tying,embed_norm", [
    (2, False, None),     # multi-layer beam state gathers + layered init
    (1, True, None),      # weight tying: logits through the embedding matrix
    (1, False, 2.0),      # max_norm embedding renormalization
    (1, True, 2.0),       # tying + max_norm: torch renormalizes the SHARED
                          # matrix in place, so the tied out-projection sees
                          # renormalized rows too
])
def test_beam_search_variants_match_reference(refmod, layers, tying,
                                              embed_norm):
    """Config-variant beam parity against the reference's own forward()."""
    from sat_tpu.decode.api import caption_from_annotations

    B, K, S = 2, 3, 10
    sat, cfg, params, _, annots_j = make_pair(
        refmod, batch=B, decoder_layers=layers, weight_tying=tying,
        embed_norm=embed_norm, seed=61)
    with torch.no_grad():
        ref_caps, ref_scores, _, _ = sat.caption(
            torch.zeros(B, 3, 8, 8), beamk=K, max_gen_length=S,
            rescore_method="LN", return_all=True)
    caps, scores, _, _ = caption_from_annotations(
        params, cfg, annots_j, (GRID_H, GRID_W), beamk=K, max_gen_length=S,
        rescore_method="LN", return_all=True)
    for i in range(B):
        for j in range(K):
            assert caps[i][j] == list(ref_caps[i][j]), (i, j)
            assert abs(scores[i][j] - ref_scores[i][j]) < (
                1e-3 + 5e-4 * abs(ref_scores[i][j]))


@pytest.mark.parametrize("tying,embed_norm", [
    (True, None), (False, 2.0), (True, 2.0)])
def test_train_batch_variants_match_reference(refmod, tying, embed_norm):
    """Config-variant teacher-forced parity (loss + masked logits)."""
    import jax
    import jax.numpy as jnp
    from sat_tpu.models.sat import train_forward, sat_loss

    R, T = 5, 9
    sat, cfg, params, _, annots_j = make_pair(
        refmod, batch=1, weight_tying=tying, embed_norm=embed_norm, seed=71)
    caps, lens = _captions(R, T, seed=13)
    batch = (torch.zeros(1, 3, 8, 8), torch.from_numpy(caps).unsqueeze(0),
             torch.from_numpy(lens).unsqueeze(0))
    with torch.no_grad():
        lp, tp, ref_alphas = sat.train_batch(batch, epsilon=1.0)
        ref_loss = sat.criterion(lp.data, tp.data) + sat.hparams.att_gamma * (
            (1 - ref_alphas.sum(dim=1)) ** 2).mean()
        ref_logits, _ = torch.nn.utils.rnn.pad_packed_sequence(
            lp, batch_first=True, total_length=T - 1)

    logits, targets, alphas = train_forward(
        params, cfg, jnp.repeat(annots_j, R, axis=0),
        jnp.asarray(caps, jnp.int32), jnp.asarray(lens, jnp.int32),
        jnp.asarray(1.0, jnp.float32), rng=jax.random.PRNGKey(0), train=False)
    m = sat_loss(cfg, logits, targets, jnp.asarray(lens, jnp.int32), alphas)
    mask = lens[:, None] > np.arange(T - 1)[None, :]
    np.testing.assert_allclose(np.asarray(logits)[mask],
                               ref_logits.numpy()[mask],
                               atol=3e-4, rtol=2e-4)
    assert abs(float(m["loss"]) - float(ref_loss)) < 2e-4


# ---------------------------------------------------------------------------
# the documented InitLSTM divergence
# ---------------------------------------------------------------------------


def test_reference_initlstm_batch_scramble_is_real_and_isolated(refmod):
    """Pin the reference bug this framework deliberately does NOT replicate:
    InitLSTM's raw reshape (model.py:79) mixes batch rows, so its h0 for a
    batch of DISTINCT images depends on other images in the batch.  Where
    rows are identical (beam search, B=1 training) it coincides with the
    per-row transpose sat_tpu implements — proven by the parity tests above.
    """
    sat, cfg, params, annots_t, annots_j = make_pair(refmod, batch=3, seed=9)
    with torch.no_grad():
        h_batch, _ = sat.init_lstm(annots_t)            # all 3 rows at once
        h_solo = torch.stack(
            [sat.init_lstm(annots_t[i:i + 1])[0][:, 0] for i in range(3)],
            dim=1)                                      # each row alone
    # row 0 agrees (reshape touches nothing before it)...
    np.testing.assert_allclose(h_batch[:, 0].numpy(), h_solo[:, 0].numpy(),
                               atol=1e-6)
    # ...but at least one later row is contaminated by its neighbors
    assert not np.allclose(h_batch[:, 1:].numpy(), h_solo[:, 1:].numpy(),
                           atol=1e-4)

    # sat_tpu's init equals the reference's SOLO (well-defined) semantics
    from sat_tpu.models.decoder import init_lstm_state
    import jax.numpy as jnp
    h_tpu, c_tpu = init_lstm_state(params, annots_j, cfg)
    np.testing.assert_allclose(np.asarray(h_tpu), h_solo.numpy(),
                               atol=1e-5, rtol=1e-4)
