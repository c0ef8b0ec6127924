"""Beam-search parity tests.

The static-shape batched search (sat_tpu/decode/beam.py) is validated against a
slow per-image oracle that replicates the reference's dynamic shrinking-beam
semantics literally (reference: model.py:237-472): beams retire on <END>, beamk
shrinks, rescoring happens at retirement time."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models import decoder as D
from sat_tpu.decode.beam import beam_search, greedy_decode
from sat_tpu.decode.api import caption_from_annotations, unpack_beam_result

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def make_cfg(v=31, **kw):
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi["<UNK>"] = v - 3
    stoi["<START>"] = v - 2
    stoi["<END>"] = v - 1
    stoi["<PAD>"] = 0
    base = dict(vocab_size=v, vocab_stoi=stoi, embed_dim=10, encoder_dim=8,
                attention_dim=6, decoder_dim=12, decoder_layers=1,
                deep_output=True)
    base.update(kw)
    return SATConfig(**base)


def oracle_beam(params, cfg, annots, beamk, max_gen_length, temperature=1.0,
                rescore_method=None, rescore_reward=0.5):
    """Literal reimplementation of the reference's per-image loop
    (model.py:260-467) on top of the same decoder math."""
    V = cfg.vocab_size
    stoi = cfg.vocab_stoi
    start_i, end_i = stoi["<START>"], stoi["<END>"]
    pad_i, unk_i = stoi["<PAD>"], stoi["<UNK>"]
    temps = temperature if isinstance(temperature, list) else [temperature]

    a = np.repeat(annots[None], beamk, 0)           # (k, L, D)
    # the reference's raw init reshape over the k-row expanded batch hands
    # each beam slot a different projection slice (model.py:79; pinned
    # against the reference's own code in test_reference_oracle.py)
    h, c = D.init_lstm_state_beams(params, jnp.array(annots)[None], cfg, beamk)
    h, c = np.array(h)[:, 0], np.array(c)[:, 0]     # (layers, k, H)
    top_preds = np.full((1, beamk), start_i, np.int64)
    top_scores = np.zeros(beamk)
    fin_caps, fin_scores, fin_ppl = [], [], []
    step = 0
    while True:
        cur_t = temps[step % len(temps)]
        prev = top_preds[step]
        embed = np.array(D.embed_tokens(params, jnp.array(prev), cfg))
        att_enc = D.attention_precompute(params, jnp.array(a))
        zt, _ = D.soft_attention(params, att_enc, jnp.array(a), jnp.array(h[-1]))
        beta = np.array(D.beta_gate(params, jnp.array(h[-1])))
        x = np.concatenate([embed, beta * np.array(zt)], axis=1)
        from sat_tpu.ops.lstm import lstm_stack_step
        h_j, c_j = lstm_stack_step(jnp.array(x), jnp.array(h), jnp.array(c),
                                   params["lstm"])
        h, c = np.array(h_j), np.array(c_j)
        logits = np.array(D.deep_output(params, cfg, jnp.array(embed),
                                        jnp.array(h[-1]), zt))
        logits = logits / cur_t
        lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True))
        scores = logits - logits.max(1, keepdims=True) - lse
        scores[:, [start_i, pad_i]] = -np.inf
        if step == 0:
            scores[:, [end_i, unk_i]] = -np.inf
            pred_idx = np.argsort(-scores[0])[:beamk]
            top_scores = scores[0][pred_idx]
            top_preds = np.concatenate([top_preds, pred_idx[None]], 0)
        else:
            seq = scores + top_scores[:, None]
            flat = seq.reshape(-1)
            pred_idx = np.argsort(-flat)[:beamk]
            top_scores = flat[pred_idx]
            parent = pred_idx // V
            tok = pred_idx % V
            top_preds = np.concatenate([top_preds[:, parent], tok[None]], 0)
            h, c = h[:, parent], c[:, parent]
            a = a[parent]

        def rescore(s):
            if rescore_method == "LN":
                return s / step
            if rescore_method == "WR":
                return s + rescore_reward * step
            if rescore_method == "BAR":
                return s + rescore_reward * (-np.mean(top_scores))
            return s

        complete = top_preds[step + 1] == end_i
        if complete.any():
            for i in np.where(complete)[0]:
                fin_caps.append(top_preds[1:-1, i].tolist())
                fin_scores.append(float(rescore(top_scores[i])))
                fin_ppl.append(float(np.exp(-top_scores[i] / step)))
            keep = ~complete
            top_preds = top_preds[:, keep]
            top_scores = top_scores[keep]
            h, c = h[:, keep], c[:, keep]
            a = a[keep]
            beamk = int(keep.sum())
            if beamk == 0:
                break
        if step >= max_gen_length:
            for i in range(top_preds.shape[1]):
                fin_caps.append(top_preds[1:-1, i].tolist())
                fin_scores.append(float(rescore(top_scores[i])))
                fin_ppl.append(float(np.exp(-top_scores[i] / step)))
            break
        step += 1
    return fin_caps, fin_scores, fin_ppl


@pytest.mark.parametrize("rescore", [None, "LN", "WR", "BAR"])
def test_batched_beam_matches_reference_oracle(rescore):
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    b, L, k, S = 3, 6, 4, 12
    annots = rng.normal(size=(b, L, cfg.encoder_dim)).astype(np.float32)

    res = beam_search(params, cfg, jnp.array(annots), beamk=k,
                      max_gen_length=S, rescore_method=rescore)
    caps, scores, _, ppl = unpack_beam_result(res, (2, 3), return_all=True)

    for i in range(b):
        o_caps, o_scores, o_ppl = oracle_beam(params, cfg, annots[i], k, S,
                                              rescore_method=rescore)
        order = np.argsort(-np.array(o_scores), kind="stable")
        o_caps = [o_caps[j] for j in order]
        o_scores = [o_scores[j] for j in order]
        o_ppl = [o_ppl[j] for j in order]
        assert len(caps[i]) == k == len(o_caps)
        np.testing.assert_allclose(sorted(scores[i], reverse=True),
                                   sorted(o_scores, reverse=True), atol=2e-4)
        np.testing.assert_allclose(sorted(ppl[i]), sorted(o_ppl), rtol=2e-4)
        # compare caption sets (order may differ on near-ties)
        got = {tuple(cc) for cc in caps[i]}
        want = {tuple(cc) for cc in o_caps}
        assert got == want


def test_temperature_list_cycles():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(9)
    annots = rng.normal(size=(2, 6, cfg.encoder_dim)).astype(np.float32)
    res1 = beam_search(params, cfg, jnp.array(annots), beamk=3,
                       max_gen_length=10, temperature=[0.7, 1.3])
    caps1, s1, _, _ = unpack_beam_result(res1, (2, 3), return_all=True)
    o_caps, o_scores, _ = oracle_beam(params, cfg, annots[0], 3, 10,
                                      temperature=[0.7, 1.3])
    assert {tuple(c) for c in caps1[0]} == {tuple(c) for c in o_caps}
    np.testing.assert_allclose(sorted(s1[0]), sorted(o_scores), atol=2e-4)


def test_greedy_equals_beam1():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    annots = jnp.array(rng.normal(size=(4, 6, cfg.encoder_dim)).astype(np.float32))
    # score contract matches beam_search for EVERY rescore mode (greedy used
    # to length-normalize unconditionally, so its default-scores disagreed
    # with beam_search(beamk=1)'s raw cumulative logprobs)
    for method in (None, "LN", "WR", "BAR"):
        g = greedy_decode(params, cfg, annots, max_gen_length=12,
                          rescore_method=method)
        b1 = beam_search(params, cfg, annots, beamk=1, max_gen_length=12,
                         rescore_method=method)
        np.testing.assert_array_equal(np.array(g.tokens), np.array(b1.tokens))
        np.testing.assert_array_equal(np.array(g.lengths), np.array(b1.lengths))
        np.testing.assert_allclose(np.array(g.raw_scores),
                                   np.array(b1.raw_scores), atol=1e-5)
        np.testing.assert_allclose(np.array(g.scores), np.array(b1.scores),
                                   atol=1e-5)
        np.testing.assert_allclose(np.array(g.perplexity),
                                   np.array(b1.perplexity), rtol=1e-4)


def test_caption_output_contract():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    annots = jnp.array(rng.normal(size=(3, 6, cfg.encoder_dim)).astype(np.float32))
    caps, scores, alphas, ppl = caption_from_annotations(
        params, cfg, annots, (2, 3), beamk=3, max_gen_length=8,
        rescore_method="LN")
    stoi = cfg.vocab_stoi
    assert len(caps) == len(scores) == len(alphas) == len(ppl) == 3
    for cap, al in zip(caps, alphas):
        # no specials inside the caption body
        assert stoi["<START>"] not in cap and stoi["<PAD>"] not in cap
        assert stoi["<END>"] not in cap
        assert al.shape == (len(cap), 2, 3)
        # attention maps are proper distributions per word
        np.testing.assert_allclose(al.reshape(len(cap), -1).sum(-1), 1.0, atol=1e-4)


@pytest.mark.parametrize("method", ["multinomial", "topk"])
def test_sampling_methods_produce_valid_captions(method):
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    annots = jnp.array(rng.normal(size=(2, 6, cfg.encoder_dim)).astype(np.float32))
    res = beam_search(params, cfg, annots, beamk=4, max_gen_length=10,
                      sample_method=method, sample_topk=3,
                      rng=jax.random.PRNGKey(11))
    caps, scores, _, _ = unpack_beam_result(res, (2, 3), return_all=True)
    stoi = cfg.vocab_stoi
    for i in range(2):
        assert len(caps[i]) == 4
        for cap in caps[i]:
            assert 1 <= len(cap) <= 10
            for t in cap:
                assert t not in (stoi["<START>"], stoi["<PAD>"], stoi["<END>"])
    # different rng -> different samples (stochastic path live)
    res2 = beam_search(params, cfg, annots, beamk=4, max_gen_length=10,
                       sample_method=method, sample_topk=3,
                       rng=jax.random.PRNGKey(12))
    caps2, _, _, _ = unpack_beam_result(res2, (2, 3), return_all=True)
    assert any(tuple(map(tuple, caps[i])) != tuple(map(tuple, caps2[i]))
               for i in range(2))


def test_decoder_noise_changes_output_and_decays():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    annots = jnp.array(rng.normal(size=(2, 6, cfg.encoder_dim)).astype(np.float32))
    base = beam_search(params, cfg, annots, beamk=3, max_gen_length=10)
    noisy = beam_search(params, cfg, annots, beamk=3, max_gen_length=10,
                        decoder_noise=2.0, rng=jax.random.PRNGKey(5))
    assert not np.array_equal(np.array(base.tokens), np.array(noisy.tokens))


@pytest.mark.parametrize("seed,b,L,k,S,v,dec", [
    (11, 2, 4, 2, 6, 23, 24),
    (12, 4, 9, 5, 15, 47, 16),
    (13, 1, 6, 3, 9, 31, 40),
    (14, 3, 12, 6, 20, 63, 32),
    (15, 2, 5, 4, 7, 19, 8),
])
def test_beam_oracle_fuzz_shapes(seed, b, L, k, S, v, dec):
    """Token-exactness vs the literal reference oracle across randomized
    shapes, beam widths, and horizons (catches mask/retirement off-by-ones
    that a single shape can miss)."""
    cfg = make_cfg(v=v, decoder_dim=dec, embed_dim=max(8, dec // 2),
                   attention_dim=max(8, dec // 2))
    params = D.init_decoder_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    annots = rng.normal(size=(b, L, cfg.encoder_dim)).astype(np.float32)
    res = beam_search(params, cfg, jnp.array(annots), beamk=k,
                      max_gen_length=S, rescore_method="LN")
    caps, scores, _, _ = unpack_beam_result(res, (1, L), return_all=True)
    for i in range(b):
        o_caps, o_scores, _ = oracle_beam(params, cfg, annots[i], k, S,
                                          rescore_method="LN")
        assert {tuple(c) for c in caps[i]} == {tuple(c) for c in o_caps}, \
            (seed, i)
        np.testing.assert_allclose(sorted(scores[i], reverse=True),
                                   sorted(o_scores, reverse=True), atol=3e-4)


def test_greedy_early_exit_matches_scan():
    """greedy_decode(early_exit=True) must equal the fixed scan bitwise in
    every field — when captions finish early AND when none ever finish
    (mirrors test_early_exit_matches_scan for the beam path; VERDICT r1 #4:
    the reference's serial loop break, model.py:427-446)."""
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(17)
    annots = jnp.array(rng.normal(size=(4, 6, cfg.encoder_dim))
                       .astype(np.float32))
    end_i = cfg.vocab_stoi["<END>"]

    early_params = dict(params)
    early_params["out_proj"] = dict(params["out_proj"])
    early_params["out_proj"]["b"] = (
        params["out_proj"]["b"].at[end_i].set(50.0))

    for p in (early_params, params):
        r_scan = greedy_decode(p, cfg, annots, max_gen_length=14)
        r_fast = greedy_decode(p, cfg, annots, max_gen_length=14,
                               early_exit=True)
        for f in BeamResultFields:
            np.testing.assert_array_equal(
                np.asarray(getattr(r_scan, f)), np.asarray(getattr(r_fast, f)),
                err_msg=f)


BeamResultFields = ("tokens", "lengths", "raw_scores", "scores",
                    "perplexity", "alphas")


def test_early_exit_matches_scan():
    """early_exit=True (while_loop) must reproduce the scan exactly in every
    consumed output: tokens, lengths, scores, perplexity, and alpha rows
    < length — both when captions end early and when none ever end."""
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    b, L, k, S = 3, 6, 4, 14
    annots = jnp.array(rng.normal(size=(b, L, cfg.encoder_dim))
                       .astype(np.float32))
    end_i = cfg.vocab_stoi["<END>"]

    # bias the output projection hard toward <END>: captions finish at t=1
    # (step 0 masks <END>), so the while_loop exits ~12 steps early
    early_params = jax.tree_util.tree_map(lambda x: x, params)
    early_params["out_proj"] = dict(params["out_proj"])
    early_params["out_proj"]["b"] = (
        params["out_proj"]["b"].at[end_i].set(50.0))

    for p in (early_params, params):  # early finish / never finishes
        r_scan = beam_search(p, cfg, annots, beamk=k, max_gen_length=S,
                             rescore_method="LN")
        r_fast = beam_search(p, cfg, annots, beamk=k, max_gen_length=S,
                             rescore_method="LN", early_exit=True)
        np.testing.assert_array_equal(np.asarray(r_scan.tokens),
                                      np.asarray(r_fast.tokens))
        np.testing.assert_array_equal(np.asarray(r_scan.lengths),
                                      np.asarray(r_fast.lengths))
        for f in ("raw_scores", "scores", "perplexity"):
            np.testing.assert_allclose(np.asarray(getattr(r_scan, f)),
                                       np.asarray(getattr(r_fast, f)),
                                       atol=1e-6)
        lens = np.asarray(r_scan.lengths)
        a_scan, a_fast = np.asarray(r_scan.alphas), np.asarray(r_fast.alphas)
        for i in range(b):
            for j in range(k):
                n = int(lens[i, j])
                np.testing.assert_allclose(a_scan[i, j, :n], a_fast[i, j, :n],
                                           atol=1e-6)


def test_normalize_rescore_method():
    """Unrecognized rescore strings must fail loudly — a lowercase CLI typo
    used to silently fall through the rescore dispatch to no rescoring."""
    from sat_tpu.decode.beam import normalize_rescore_method
    assert normalize_rescore_method(None) is None
    assert normalize_rescore_method("none") is None
    assert normalize_rescore_method("None") is None
    assert normalize_rescore_method("") is None
    assert normalize_rescore_method("ln") == "LN"
    assert normalize_rescore_method("WR") == "WR"
    assert normalize_rescore_method("bar") == "BAR"
    with pytest.raises(ValueError):
        normalize_rescore_method("WN")


def test_topk_small_matches_lax_topk():
    """topk_small (iterative variadic-reduce, the 8.3x beam-selection win —
    tools/ab_topk.py) must match lax.top_k bit-for-bit, including the
    ascending-index tie-break, and fall back to lax.top_k for large k."""
    import jax
    import jax.numpy as jnp
    from sat_tpu.decode.beam import topk_small

    rng = np.random.default_rng(7)
    for shape, k in (((5, 64), 3), ((2, 3, 40), 4), ((9, 33), 1),
                     ((4, 100), 8), ((3, 50), 12)):  # 12 -> sort fallback
        x = rng.standard_normal(shape).astype(np.float32) * 4
        for data in (x, np.round(x)):  # quantized -> many exact ties
            v, i = jax.jit(lambda a: topk_small(a, k))(jnp.asarray(data))
            vr, ir = jax.lax.top_k(jnp.asarray(data), k)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
            np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
