"""Distributional verification of the sampling decode modes (VERDICT r2 #5).

The reference samples beam continuations with ``torch.multinomial`` over
``softmax(20*seq_scores/step)`` (per-parent rows, model.py:360-364) or over
``softmax(candidate_scores/step)`` restricted to each parent's top
``sample_topk`` candidates (model.py:365-379).  sat_tpu implements both as
Gumbel-top-k over the same log-weights (decode/beam.py) — argued equivalent
in round 2, but never statistically pinned.  These tests pin it:

* every batch row of one ``beam_search`` call samples independently (the
  Gumbel draw covers the full (B, k, V) shape), so ONE call over N tiled
  identical annotation rows yields N iid trajectory samples;
* the theoretical weights are computed from the deterministic per-step
  log-probabilities via the SAME production decoder primitives beam.py
  composes (forward parity vs the literal reference is pinned separately in
  test_reference_oracle.py), then a Pearson chi-square compares observed
  token counts against them at alpha = 1e-4;
* each positive test ships a NEGATIVE control: the same statistic against a
  plausibly-wrong weight formula (divisor off by one as if step were t+1,
  missing 20x sharpening, uniform-over-candidates) must REJECT — otherwise
  the chi-square would be too weak to certify anything.

Gumbel-top-k ~ sequential multinomial-without-replacement: the k largest
gumbel-perturbed log-weights are distributed exactly like k sequential
renormalized draws, and ``lax.top_k``'s descending order preserves draw
order, so slot 0 of the selection is one PLAIN multinomial draw.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.stats

import jax
import jax.numpy as jnp

from sat_tpu.config import SATConfig
from sat_tpu.decode.beam import NEG_INF, beam_search
from sat_tpu.models.decoder import (attention_precompute, beta_gate,
                                    deep_output, embed_tokens,
                                    init_decoder_params,
                                    init_lstm_state_beams, soft_attention)
from sat_tpu.ops.lstm import lstm_stack_step

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier

V, L_GRID, ENC_D = 12, 4, 8
N_SAMPLES = 8192
ALPHA = 1e-4          # per-test false-positive rate for the chi-square


def _cfg():
    stoi = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3}
    for i in range(4, V):
        stoi[f"w{i}"] = i
    return SATConfig(vocab_size=V, vocab_stoi=stoi, embed_dim=8,
                     attention_dim=8, decoder_dim=16, encoder_dim=ENC_D,
                     decoder_layers=1, deep_output=True, dropout=0.0,
                     embedding_dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_decoder_params(jax.random.PRNGKey(3), cfg)
    annots = jax.random.normal(jax.random.PRNGKey(4), (1, L_GRID, ENC_D))
    return cfg, params, annots


def _masks(cfg):
    stoi = cfg.vocab_stoi
    always = np.zeros(V)
    always[[stoi["<START>"], stoi["<PAD>"]]] = NEG_INF
    step0 = always.copy()
    step0[[stoi["<END>"], stoi["<UNK>"]]] = NEG_INF
    return jnp.asarray(always), jnp.asarray(step0)


def _scaffold_logp(cfg, params, annots, beamk, temperature, prev_words,
                   h, c, t):
    """One deterministic decode step with the SAME production primitives
    beam.py composes: returns (logp (k, V) incl. special-token masks,
    h', c')."""
    always_mask, step0_mask = _masks(cfg)
    k = beamk
    ann_flat = attention_precompute(params, annots)[0][None].repeat(k, 0)
    annot_flat = annots[0][None].repeat(k, 0)
    prev_embed = embed_tokens(params, prev_words.reshape(k), cfg)
    hidden = h[-1].reshape(k, -1)
    zt, alpha = soft_attention(params, ann_flat, annot_flat, hidden)
    beta = beta_gate(params, hidden)
    x = jnp.concatenate([prev_embed, beta * zt], axis=-1)
    h_new, c_new = lstm_stack_step(x, h.reshape(h.shape[0], k, -1),
                                   c.reshape(c.shape[0], k, -1),
                                   params["lstm"])
    logits = deep_output(params, cfg, prev_embed, h_new[-1], zt)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature,
                              axis=-1)
    logp = logp + (step0_mask if t == 0 else always_mask)
    return logp, h_new[:, :, None], c_new[:, :, None]


def _prefix_state(cfg, params, annots, beamk, temperature):
    """The deterministic t=0 prefix: plain top-k over SLOT 0's scores
    (beam.py's step-0 parity with model.py:338-345).  Returns
    (w0 (k,) chosen tokens, s0 (k,) their logprobs, h, c after t=0)."""
    stoi = cfg.vocab_stoi
    h, c = init_lstm_state_beams(params, annots, cfg, beamk)  # (lay,1,k,H)
    prev = jnp.full((beamk,), stoi["<START>"], jnp.int32)
    logp, h, c = _scaffold_logp(cfg, params, annots, beamk, temperature,
                                prev, h[:, 0], c[:, 0], t=0)
    s0, w0 = jax.lax.top_k(logp[0], beamk)                    # slot-0 row
    return w0, s0, h, c


def _chi2(observed_counts, probs):
    """Pearson chi-square over categories with expected count >= 5 (smaller
    ones pooled into one bucket); returns (statistic, critical value)."""
    n = observed_counts.sum()
    exp = probs * n
    big = exp >= 5
    obs_b = np.concatenate([observed_counts[big],
                            [observed_counts[~big].sum()]])
    exp_b = np.concatenate([exp[big], [exp[~big].sum()]])
    if exp_b[-1] < 1e-9:      # nothing pooled: drop the empty bucket
        obs_b, exp_b = obs_b[:-1], exp_b[:-1]
        assert observed_counts[~big].sum() == 0, (
            "samples landed on zero-probability categories")
    stat = float(((obs_b - exp_b) ** 2 / np.maximum(exp_b, 1e-12)).sum())
    crit = float(scipy.stats.chi2.ppf(1 - ALPHA, len(obs_b) - 1))
    return stat, crit


def _sampled_tokens_at_t1(cfg, params, annots, *, sample_method, beamk,
                          temperature, sample_topk=3, seed=0,
                          n=N_SAMPLES):
    """Run ONE batched beam_search over N tiled rows with max_gen_length=1
    (steps t=0,1; t=1 is the LAST step, so slot order still reflects the
    Gumbel-top-k draw order) and return tokens[:, :, 1:3] (t=0 prefix word +
    the t=1 sample per slot)."""
    tiled = jnp.tile(annots, (n, 1, 1))
    res = beam_search(params, cfg, tiled, beamk=beamk, max_gen_length=1,
                      temperature=temperature, sample_method=sample_method,
                      sample_topk=sample_topk,
                      rng=jax.random.PRNGKey(seed))
    return np.asarray(res.tokens[:, :, 1:3])


# ---------------------------------------------------------------------------
# multinomial: softmax(20 * seq_scores / step) per parent row
# ---------------------------------------------------------------------------


def _multinomial_t1_probs(cfg, params, annots, temperature, divisor=1.0,
                          sharpen=20.0):
    w0, s0, h, c = _prefix_state(cfg, params, annots, 1, temperature)
    logp1, _, _ = _scaffold_logp(cfg, params, annots, 1, temperature,
                                 w0, h, c, t=1)
    seq_scores = np.asarray(s0[0] + logp1[0])                  # (V,)
    z = sharpen * seq_scores / divisor
    z = z - z.max()
    p = np.exp(z)
    return w0, p / p.sum()


def test_multinomial_matches_reference_weights(setup):
    cfg, params, annots = setup
    temperature = 25.0   # flatten the logits so softmax(20*s) is non-degenerate
    w0, probs = _multinomial_t1_probs(cfg, params, annots, temperature)
    # distribution must be informative for the test to mean anything
    live = probs[probs > 1e-6]
    assert live.max() / live.min() > 1.5 and live.max() < 0.9

    toks = _sampled_tokens_at_t1(cfg, params, annots,
                                 sample_method="multinomial", beamk=1,
                                 temperature=temperature)
    assert (toks[:, 0, 0] == int(w0[0])).all()          # deterministic t=0
    counts = np.bincount(toks[:, 0, 1], minlength=V).astype(float)
    stat, crit = _chi2(counts, probs)
    assert stat < crit, (stat, crit)

    # NEGATIVE control 1: divisor as if step were t+1 (the off-by-one this
    # test exists to catch) must be rejected on the same sample
    _, probs_wrong = _multinomial_t1_probs(cfg, params, annots, temperature,
                                           divisor=2.0)
    stat_w, crit_w = _chi2(counts, probs_wrong)
    assert stat_w > crit_w, (stat_w, crit_w)
    # NEGATIVE control 2: missing the 20x sharpening
    _, probs_flat = _multinomial_t1_probs(cfg, params, annots, temperature,
                                          sharpen=1.0)
    stat_f, crit_f = _chi2(counts, probs_flat)
    assert stat_f > crit_f, (stat_f, crit_f)


def test_multinomial_divisor_at_t2(setup):
    """At t=2 the reference divides by step=2.  Condition on the most likely
    t=1 token (conditioning on a sampled prefix keeps the conditional law
    exact) and chi-square the t=2 sample against softmax(20*s/2)."""
    cfg, params, annots = setup
    temperature = 5.0   # power analysis: at 25.0 the divisor-3 control's
    # chi-square noncentrality is ~6 (undetectable); at 5.0 it is ~200
    w0, s0, h, c = _prefix_state(cfg, params, annots, 1, temperature)
    logp1, h, c = _scaffold_logp(cfg, params, annots, 1, temperature,
                                 w0, h, c, t=1)
    seq1 = np.asarray(s0[0] + logp1[0])
    # condition on the most likely NON-END t=1 token (conditioning on any
    # fixed sampled value keeps the conditional law exact; END would end
    # the trajectory before t=2)
    order = np.argsort(seq1)[::-1]
    w1 = int(order[order != cfg.vocab_stoi["<END>"]][0])
    logp2, _, _ = _scaffold_logp(cfg, params, annots, 1, temperature,
                                 jnp.asarray([w1], jnp.int32), h, c, t=2)
    seq2 = np.asarray(seq1[w1] + logp2[0])

    def probs(divisor):
        z = 20.0 * seq2 / divisor
        z = z - z.max()
        p = np.exp(z)
        return p / p.sum()

    tiled = jnp.tile(annots, (2 * N_SAMPLES, 1, 1))
    res = beam_search(params, cfg, tiled, beamk=1, max_gen_length=2,
                      temperature=temperature, sample_method="multinomial",
                      rng=jax.random.PRNGKey(11))
    toks = np.asarray(res.tokens)
    sel = toks[:, 0, 2] == w1                    # rows whose t=1 draw == w1
    assert sel.sum() > 2000                      # enough conditioned samples
    # drop rows that FINISHED at t=1 (w1 == <END> never true: argmax check)
    assert w1 != cfg.vocab_stoi["<END>"]
    counts = np.bincount(toks[sel, 0, 3], minlength=V).astype(float)
    stat, crit = _chi2(counts, probs(2.0))       # reference: step == 2
    assert stat < crit, (stat, crit)
    stat_w, crit_w = _chi2(counts, probs(3.0))   # off-by-one rejected
    assert stat_w > crit_w, (stat_w, crit_w)
    stat_v, crit_v = _chi2(counts, probs(1.0))   # stale divisor rejected
    assert stat_v > crit_v, (stat_v, crit_v)


def test_multinomial_beam2_first_draw_and_row_normalization(setup):
    """beamk=2: weights are PER-PARENT-ROW softmaxes flattened to 2V
    candidates (each row sums to 1 — model.py:362's dim=1 softmax).  Slot 0
    of the Gumbel-top-k selection is one plain multinomial draw over the
    2V flat weights; chi-square it, and reject the JOINT-softmax variant
    (normalizing over the flat 2V at 20x sharpening) that a wrong dim would
    produce."""
    cfg, params, annots = setup
    temperature = 25.0
    k = 2
    w0, s0, h, c = _prefix_state(cfg, params, annots, k, temperature)
    logp1, _, _ = _scaffold_logp(cfg, params, annots, k, temperature,
                                 w0, h, c, t=1)
    seq = np.asarray(s0[:, None] + logp1)                     # (2, V)

    def row_softmax_probs():
        z = 20.0 * seq / 1.0
        z = z - z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p = p / p.sum(axis=1, keepdims=True)                  # rows sum to 1
        return (p / k).reshape(-1)                            # flat, sums 1

    def joint_softmax_probs():
        z = (20.0 * seq / 1.0).reshape(-1)
        z = z - z.max()
        p = np.exp(z)
        return p / p.sum()

    toks = _sampled_tokens_at_t1(cfg, params, annots,
                                 sample_method="multinomial", beamk=k,
                                 temperature=temperature, seed=7,
                                 n=4 * N_SAMPLES)  # row-vs-joint softmax
                                 # differ only via the two parents' row
                                 # normalizers; the control needs the power
    # parent of each slot = which deterministic t=0 word its prefix carries
    w0_np = np.asarray(w0)
    assert w0_np[0] != w0_np[1]
    slot0 = toks[:, 0]                                        # first draw
    parent = (slot0[:, 0] == w0_np[1]).astype(int)
    assert np.isin(slot0[:, 0], w0_np).all()
    flat = parent * V + slot0[:, 1]
    counts = np.bincount(flat, minlength=k * V).astype(float)
    stat, crit = _chi2(counts, row_softmax_probs())
    assert stat < crit, (stat, crit)
    stat_j, crit_j = _chi2(counts, joint_softmax_probs())
    assert stat_j > crit_j, (stat_j, crit_j)


# ---------------------------------------------------------------------------
# topk: softmax(candidate_scores / step) over each parent's top sample_topk
# ---------------------------------------------------------------------------


def test_topk_sampling_matches_reference_weights(setup):
    cfg, params, annots = setup
    temperature, topk = 1.0, 3   # unflattened: candidates must be distinct
    w0, s0, h, c = _prefix_state(cfg, params, annots, 1, temperature)
    logp1, _, _ = _scaffold_logp(cfg, params, annots, 1, temperature,
                                 w0, h, c, t=1)
    seq = np.asarray(s0[0] + logp1[0])
    cand = np.argsort(seq)[::-1][:topk]                       # top-3 tokens
    z = seq[cand] / 1.0                                       # step == 1
    z = z - z.max()
    pc = np.exp(z) / np.exp(z).sum()
    probs = np.zeros(V)
    probs[cand] = pc
    assert pc.max() / pc.min() > 1.3                          # informative

    toks = _sampled_tokens_at_t1(cfg, params, annots, sample_method="topk",
                                 beamk=1, sample_topk=topk,
                                 temperature=temperature, seed=5)
    counts = np.bincount(toks[:, 0, 1], minlength=V).astype(float)
    assert counts[np.setdiff1d(np.arange(V), cand)].sum() == 0  # only top-3
    stat, crit = _chi2(counts, probs)
    assert stat < crit, (stat, crit)

    # NEGATIVE control 1: uniform over the candidates (the commented-out
    # variant at model.py:374-375) must be rejected
    uni = np.zeros(V)
    uni[cand] = 1.0 / topk
    stat_u, crit_u = _chi2(counts, uni)
    assert stat_u > crit_u, (stat_u, crit_u)
    # NEGATIVE control 2: the multinomial mode's 20x sharpening does NOT
    # apply to the topk mode's candidate softmax
    z20 = 20.0 * seq[cand]
    z20 = z20 - z20.max()
    p20 = np.zeros(V)
    p20[cand] = np.exp(z20) / np.exp(z20).sum()
    stat_s, crit_s = _chi2(counts, p20)
    assert stat_s > crit_s, (stat_s, crit_s)


def test_rows_sample_independently(setup):
    """The iid-across-batch-rows premise of every test above: two different
    tiled rows' samples must not be identical streams (the Gumbel draw spans
    the batch dimension)."""
    cfg, params, annots = setup
    toks = _sampled_tokens_at_t1(cfg, params, annots,
                                 sample_method="multinomial", beamk=1,
                                 temperature=25.0, seed=9)
    col = toks[:, 0, 1]
    assert len(np.unique(col)) > 1
    # and the sample changes with the rng key (no fixed-seed shortcut inside)
    toks2 = _sampled_tokens_at_t1(cfg, params, annots,
                                  sample_method="multinomial", beamk=1,
                                  temperature=25.0, seed=10)
    assert (toks2[:, 0, 1] != col).any()
