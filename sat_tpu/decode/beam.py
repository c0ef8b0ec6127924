"""Fully-batched, fully-on-device beam search with static shapes.

TPU-native redesign of the reference's inference stack (reference:
model.py:237-472), which decodes ONE image at a time with a Python while-loop,
dynamically shrinking beam width as sequences finish — the #1 performance gap
called out in SURVEY.md §3.2.  Here the whole batch decodes in a single
``lax.scan`` with ``(B, k)`` static shapes:

* Beam retirement: in the reference a beam that emits <END> leaves the batch
  and ``beamk`` shrinks (model.py:427-438).  Total finished beams per image is
  therefore exactly the initial ``beamk``.  We keep every slot and mark it
  ``finished``; a finished slot's only candidate is a "stay" entry with a huge
  sentinel score, so flat top-k provably re-selects every finished slot and
  fills the rest with the best live continuations — bit-equivalent to the
  shrinking search.
* Sampling modes (multinomial / topk, reference: model.py:360-379) are
  implemented as Gumbel-top-k over the same log-weights, which samples k items
  without replacement with exactly ``torch.multinomial``'s distribution.
* Rescoring (LN / WR / BAR, reference: model.py:405-417) and perplexity are
  applied post-scan from the raw cumulative logprob and the recorded finish
  step; BAR's "average beam prob" is recorded at each beam's finish time from
  the slots that were live that step, matching the shrinking-batch semantics.
* Step-0 special case (all beams identical -> pick top-k words from beam 0,
  always with plain top-k regardless of sample method; <END>/<UNK> masked —
  reference: model.py:338-345) is folded in by masking rows 1..k-1 to -inf.
* Decoder hidden noise ``h += N(0,1)·noise/(step+1)`` between attention and
  LSTM (reference: model.py:322-324) and per-step temperature-list cycling
  (reference: model.py:292, 330) are preserved.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import SATConfig
from ..models.decoder import (attention_precompute, decoder_step, embed_tokens,
                              init_lstm_state, init_lstm_state_beams,
                              soft_attention, beta_gate, deep_output)
from ..ops.lstm import lstm_stack_step

NEG_INF = -1e9
STAY_SCORE = 1e9  # sentinel: finished-slot "stay" candidates always win top-k


class BeamResult(NamedTuple):
    """Device-side decode result; (B, k) leading dims, host wrapper slices it."""
    tokens: jax.Array        # (B, k, S+2) int32, row = <START> w... <END>/pads
    lengths: jax.Array       # (B, k) int32 — caption word count == finish step
    raw_scores: jax.Array    # (B, k) cumulative logprob at finish
    scores: jax.Array        # (B, k) rescored scores (selection key)
    perplexity: jax.Array    # (B, k) exp(-s/len)
    alphas: jax.Array        # (B, k, S+1, L) attention maps per generated word


def _gather_beams(x: jax.Array, parent: jax.Array, axis: int) -> jax.Array:
    """Gather beam slots by parent index. parent: (B, k); x has beam dim at `axis`."""
    # expand idx to x's rank with the (B, k) dims aligned at (axis-1, axis);
    # the remaining dims stay size-1 and broadcast INSIDE take_along_axis.
    # (Materializing the index with broadcast_to instead costs ~5 ms/step on
    # v5e: XLA then emits a general gather with a full-width index tensor
    # rather than a batched slice — measured 2026-08-16, it was 95% of beam
    # search's runtime.)
    b_axis = axis - 1
    idx = parent.reshape([parent.shape[0] if i == b_axis else
                          parent.shape[1] if i == axis else 1
                          for i in range(x.ndim)])
    return jnp.take_along_axis(x, idx, axis=axis)


def topk_small(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k along the last axis for SMALL k: k fused (max, argmax)
    variadic-reduce passes instead of ``lax.top_k``'s sort lowering.

    Identical results to ``lax.top_k`` — descending values, ties broken by
    ascending index (the reduce comparator prefers the lower index on equal
    values; verified bit-for-bit incl. tie-heavy inputs by tools/ab_topk.py
    and tests/test_beam_search.py).  Each pass's exclusion mask fuses into
    the next reduce, so nothing full-width is ever materialized.

    Measured on v5e at the beam-3 validation shape (768, 4096): 19.6 us/call
    vs lax.top_k's 164 us (8.3x) — the sort was 54% of the whole beam decode
    scan (xplane, EXPERIMENTS.md round 3).  A per-128-lane-window two-stage
    top_k was also tried and lost 12x (per-window sorts don't vectorize).
    ``lax.approx_max_k`` is not eligible: no exactness guarantee at any
    recall_target."""
    if k > 8:  # sort wins asymptotically; small-k is the decode regime
        return jax.lax.top_k(x, k)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def red(a, b):
        av, ai = a
        bv, bi = b
        take_a = (av > bv) | ((av == bv) & (ai < bi))
        return (jnp.where(take_a, av, bv), jnp.where(take_a, ai, bi))

    vals, idxs = [], []
    cur = x
    for _ in range(k):
        m, a = jax.lax.reduce(
            (cur, iota), (neg, jnp.int32(2 ** 31 - 1)), red, (x.ndim - 1,))
        vals.append(m)
        idxs.append(a)
        cur = jnp.where(iota == a[..., None], neg, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


RESCORE_METHODS = ("LN", "WR", "BAR")


def normalize_rescore_method(method: Optional[str]) -> Optional[str]:
    """None / 'none' / 'None' / '' -> None; case-normalizes and VALIDATES
    known methods.  Without this an unrecognized string (e.g. a lowercase
    'ln' typo on a CLI) would silently fall through the rescore dispatch
    below to no rescoring, changing which beam wins with no warning."""
    if method is None or method in ("None", "none", ""):
        return None
    m = method.upper()
    if m not in RESCORE_METHODS:
        raise ValueError(f"unknown rescore_method {method!r}; expected one "
                         f"of {RESCORE_METHODS} (or 'none')")
    return m


def _rescore_single(scores: jax.Array, lf: jax.Array,
                    rescore_method: Optional[str],
                    rescore_reward: float) -> jax.Array:
    """Single-beam rescoring with beam_search's exact semantics
    (reference: model.py:405-425).  For a lone beam the BAR live-mean over
    slots collapses to -score."""
    rescore_method = normalize_rescore_method(rescore_method)
    if rescore_method == "LN":
        return scores / lf
    if rescore_method == "WR":
        return scores + rescore_reward * lf
    if rescore_method == "BAR":
        return scores + rescore_reward * (-scores)
    return scores


def beam_search(params: Dict, cfg: SATConfig, annotations: jax.Array,
                *, beamk: int = 3, max_gen_length: int = 32,
                temperature: Union[float, Sequence[float]] = 1.0,
                sample_method: str = "beam", sample_topk: int = 3,
                decoder_noise: Optional[float] = None,
                rescore_method: Optional[str] = None,
                rescore_reward: float = 0.5,
                rng: Optional[jax.Array] = None,
                fused: bool = False,
                early_exit: bool = False) -> BeamResult:
    """Batched beam/sampled search. annotations: (B, L, D).

    early_exit=True runs the time loop as a ``lax.while_loop`` that stops as
    soon as every beam of every image has emitted <END> — tokens, scores,
    lengths, perplexities and every CONSUMED alpha row (rows < length) are
    EXACT vs the scan (finished slots only self-copy through their PAD
    stay-candidate, and ties keep slot order), but data-dependent: captions
    that finish at t<<max_gen_length skip the tail steps entirely. Wins at
    serving batch sizes where the per-batch max length is short; the fixed
    scan pays max_gen_length always."""
    assert sample_method in ("beam", "multinomial", "topk")
    rescore_method = normalize_rescore_method(rescore_method)
    if not isinstance(temperature, (list, tuple)):
        temperature = [temperature]
    temps = jnp.asarray(temperature, jnp.float32)
    n_temps = len(temperature)

    b, L, d = annotations.shape
    k, S = beamk, max_gen_length
    v = cfg.vocab_size
    vocab = cfg.vocab_stoi
    pad_i, unk_i = int(vocab["<PAD>"]), int(vocab["<UNK>"])
    start_i, end_i = int(vocab["<START>"]), int(vocab["<END>"])
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Shared (per-image) tensors — broadcast across beams instead of the
    # reference's per-beam annotation copies (model.py:265-266, 398).
    att_enc = attention_precompute(params, annotations)          # (B, L, A)

    # Beam-expanded LSTM init: the reference's per-image k-row reshape hands
    # each beam slot a DIFFERENT slice of the init projection (model.py:79 —
    # see init_lstm_state_beams)
    h0, c0 = init_lstm_state_beams(params, annotations, cfg, k)  # (layers, B, k, H)

    # Lineage is reconstructed from backpointers AFTER the loop (see the
    # reverse scan below): the loop carries only the CURRENT token per slot
    # plus per-step record buffers it appends to.  The previous design
    # gathered the whole (B,k,S+2) token and (B,k,S+1,L) alpha histories by
    # parent every step — O(S^2) HBM traffic that the per-op profile showed
    # as real money at validation shapes.  Records are time-leading so the
    # reverse scan consumes them directly.
    cur_tok0 = jnp.full((b, k), start_i, jnp.int32)
    scores0 = jnp.zeros((b, k), jnp.float32)
    finished0 = jnp.zeros((b, k), bool)
    flen0 = jnp.zeros((b, k), jnp.int32)
    bar0 = jnp.zeros((b, k), jnp.float32)
    tok_rec0 = jnp.full((S + 1, b, k), pad_i, jnp.int32)
    # unexecuted steps (early_exit) must keep the ancestor chain fixed when
    # the reverse scan walks back through them: identity backpointers
    sparent_rec0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, None],
                                    (S + 1, b, k))
    alpha_rec0 = jnp.zeros((S + 1, b, k, L), jnp.float32)

    # Special-token masks on the vocab axis
    always_mask = jnp.zeros((v,)).at[jnp.array([start_i, pad_i])].set(NEG_INF)
    step0_mask = always_mask.at[jnp.array([end_i, unk_i])].set(NEG_INF)

    step_rngs = jax.random.split(rng, (S + 1) * 2).reshape(S + 1, 2, 2)

    noisy = decoder_noise is not None and decoder_noise != 0.0
    use_fused = fused and cfg.decoder_layers == 1 and not noisy
    if use_fused:
        # the fused kernel consumes per-beam (B*k, L, ·) copies; only built
        # on that path — the default path reads the UN-replicated (B, L, ·)
        # arrays via grouped einsums (see step_fn)
        ann_flat = att_enc[:, None].repeat(k, axis=1).reshape(b * k, L, -1)
        annot_flat = annotations[:, None].repeat(k, axis=1).reshape(b * k, L, d)
    if use_fused:
        # the fused kernel computes attention/beta/LSTM from ONE hidden state;
        # hidden noise splits them (noise applies only to the LSTM input
        # hidden, model.py:322-326), so the noisy path stays on jnp
        from ..kernels.decoder_step import (fused_decoder_step,
                                            fused_output_logits,
                                            pack_fused_weights)
        fw = pack_fused_weights(params, cfg, dtype=annotations.dtype)

    def step_fn(carry, xs):
        (cur_tok, scores, finished, flen, bar, h, c,
         tok_rec, sparent_rec, alpha_rec) = carry
        t, rngs = xs
        rng_noise, rng_gumbel = rngs[0], rngs[1]

        prev_embed = embed_tokens(params, cur_tok.reshape(b * k), cfg)  # (B*k, E)

        if use_fused:
            tproj, h1, c1, zt, alpha = fused_decoder_step(
                fw, cfg, prev_embed, h[0].reshape(b * k, -1),
                c[0].reshape(b * k, -1), annot_flat, ann_flat)
            logits = fused_output_logits(params, cfg, tproj)
            h_new = h1.reshape(h.shape)
            c_new = c1.reshape(c.shape)
        else:
            hidden = h[-1].reshape(b * k, -1)
            # Grouped soft attention (same math as decoder.soft_attention,
            # annotations/att_enc BROADCAST over the beam dim instead of
            # physically repeated — the decode-side twin of the train scan's
            # r-fold traffic cut, models/sat.py).  The replicated
            # (B*k, L, ·) reads were ~39 MB/step at b512 beam-3 and scaled
            # super-linearly in the b512 profile (EXPERIMENTS.md round 5).
            from ..models.decoder import _linear
            hidden_g = h[-1]                                      # (B, k, H)
            att_dec = _linear(params["att_dec"], hidden_g)        # (B, k, A)
            att = _linear(params["f_att"],
                          jnp.tanh(att_enc[:, None] + att_dec[:, :, None]))
            att = att[..., 0] * (L ** -0.5)                       # (B, k, L)
            alpha = jax.nn.softmax(att.astype(jnp.float32),
                                   axis=-1).astype(att.dtype)
            zt = jnp.einsum("bkl,bld->bkd", alpha,
                            annotations).reshape(b * k, -1)       # (B*k, D)
            beta = beta_gate(params, hidden)
            x = jnp.concatenate([prev_embed, beta * zt], axis=-1)

            h_in, c_in = h, c
            if noisy:
                # noise on hidden state only, decaying with step (model.py:322-324)
                h_in = h + jax.random.normal(rng_noise, h.shape) * (
                    decoder_noise / (t + 1.0))
            h_new, c_new = lstm_stack_step(
                x, h_in.reshape(h.shape[0], b * k, -1),
                c_in.reshape(c.shape[0], b * k, -1), params["lstm"])
            logits = deep_output(params, cfg, prev_embed, h_new[-1], zt)  # (B*k, V)
            h_new = h_new.reshape(h.shape)
            c_new = c_new.reshape(c.shape)
        alpha = alpha.reshape(b, k, L)

        cur_temp = temps[t % n_temps]
        scaled = logits.astype(jnp.float32) / cur_temp               # (B*k, V)
        mask_vec = jnp.where(t == 0, step0_mask, always_mask)        # (V,)

        tf = jnp.maximum(t.astype(jnp.float32), 1.0)
        if sample_method == "beam":
            # ---- two-stage exact top-k -----------------------------------
            # The flat top-k over (B, k·V) is provably equal to: per-slot
            # top-k of the slot's OWN row (its global candidates differ from
            # its row only by the slot-constant `scores` shift, so row rank ==
            # global rank within the slot), then top-k over the k·k union —
            # the global winners are a subset of the per-slot winners by
            # definition.  Ordering matches too: lax.top_k breaks ties by
            # ascending index, and both flat layouts are slot-major with
            # vocab-ascending candidates inside a slot.  The payoff is that
            # NOTHING of shape (B, k, V) is ever materialized: the previous
            # design wrote a full fp32 log_softmax plus seq_scores/stay/step-0
            # masks at that shape every step.  Like greedy, the chosen
            # logprob is recovered as scaled[idx] - logsumexp(scaled): Z
            # includes masked tokens, selection excludes them (reference
            # parity, model.py:330-340).
            masked = scaled + mask_vec
            vals, idx = topk_small(masked, k)                        # (B*k, k)
            lse = jax.scipy.special.logsumexp(scaled, axis=-1)       # (B*k,)
            # selected tokens are never masked (mask is -1e9), so
            # masked[idx] == scaled[idx]
            cand_logp = (vals - lse[:, None]).reshape(b, k, k)
            cand_seq = scores[:, :, None] + cand_logp                # (B, k, k)
            cand_tok = idx.reshape(b, k, k).astype(jnp.int32)

            # plain top-k at step 0 regardless of method (model.py:338-345),
            # selecting from SLOT 0's scores only — the reference takes
            # top_scores[0].topk(k) there; slot logits at t=0 genuinely
            # differ across slots (each gets its own init projection slice,
            # see init_lstm_state_beams), so this mask is load-bearing
            # parity, not a redundancy (tests/test_reference_oracle.py)
            beam0_only = jnp.where(jnp.arange(k)[None, :, None] == 0,
                                   cand_seq, NEG_INF)
            sel_c = jnp.where(t == 0, beam0_only, cand_seq)

            # finished slots offer exactly one "stay" candidate (rank 0,
            # token PAD) — same slot-major tie order as the previous
            # stay-at-column-PAD encoding
            stay_row = jnp.full((k,), NEG_INF).at[0].set(STAY_SCORE)
            sel_c = jnp.where(finished[:, :, None], stay_row, sel_c)
            cand_tok = jnp.where(finished[:, :, None], pad_i, cand_tok)

            _, flat_idx = topk_small(sel_c.reshape(b, k * k), k)     # (B, k)
            parent = flat_idx // k
            token = jnp.take_along_axis(cand_tok.reshape(b, k * k),
                                        flat_idx, axis=1)
            cand_scores = jnp.take_along_axis(cand_seq.reshape(b, k * k),
                                              flat_idx, axis=1)
        else:
            # sampling modes need Gumbel noise across the whole vocab row, so
            # they keep the full-width selection arrays (exploratory tools,
            # not the validation/serving hot path)
            logp = (jax.nn.log_softmax(scaled, axis=-1).reshape(b, k, v)
                    + mask_vec)
            seq_scores = scores[:, :, None] + logp                   # (B, k, V)
            if sample_method == "multinomial":
                row = 20.0 * seq_scores / tf
                sel = row - jax.scipy.special.logsumexp(row, axis=-1,
                                                        keepdims=True)
                sel = sel + jax.random.gumbel(rng_gumbel, sel.shape)
            else:  # topk: restrict to per-row top sample_topk, then sample
                kth = topk_small(seq_scores, sample_topk)[0][..., -1:]
                in_topk = seq_scores >= kth
                sel = jnp.where(in_topk, seq_scores / tf, NEG_INF)
                sel = sel + (jax.random.gumbel(rng_gumbel, sel.shape)
                             * (sel > NEG_INF / 2))
            # plain top-k at step 0 (see the beam branch note)
            beam0_only = jnp.where(jnp.arange(k)[None, :, None] == 0,
                                   seq_scores, NEG_INF)
            sel = jnp.where(t == 0, beam0_only, sel)
            # finished slots offer exactly one "stay" candidate at column PAD
            stay = jnp.full((b, k, v), NEG_INF).at[:, :, pad_i].set(STAY_SCORE)
            sel = jnp.where(finished[:, :, None], stay, sel)

            _, flat_idx = topk_small(sel.reshape(b, k * v), k)       # (B, k)
            parent = flat_idx // v
            token = (flat_idx % v).astype(jnp.int32)
            cand_scores = jnp.take_along_axis(
                seq_scores.reshape(b, k * v), flat_idx, axis=1)
        # Step 0: the reference selects the k tokens from SLOT 0's scores but
        # does NOT gather states/alphas by parent (model.py:342-347 has no
        # keep_seq_idxs) — every slot keeps its OWN h/c/alpha, which differ
        # across slots because the init reshape hands each slot a different
        # projection slice (init_lstm_state_beams).  State lineage therefore
        # uses the identity parent at t=0.
        sparent = jnp.where(t == 0, jnp.arange(k)[None, :], parent)

        p_finished = jnp.take_along_axis(finished, parent, axis=1)
        p_scores = jnp.take_along_axis(scores, parent, axis=1)
        new_scores = jnp.where(p_finished, p_scores, cand_scores)
        new_token = jnp.where(p_finished, pad_i, token)
        newly_finished = jnp.logical_and(~p_finished, new_token == end_i)
        new_finished = jnp.logical_or(p_finished, newly_finished)

        new_flen = jnp.take_along_axis(flen, parent, axis=1)
        new_flen = jnp.where(newly_finished, t, new_flen)
        # BAR bonus uses -mean of the current beams' scores among slots that
        # were live at this step, recorded at finish time (model.py:412-415)
        live_now = ~p_finished
        bar_mean = -(jnp.sum(jnp.where(live_now, new_scores, 0.0), axis=1)
                     / jnp.maximum(jnp.sum(live_now, axis=1), 1))
        new_bar = jnp.take_along_axis(bar, parent, axis=1)
        new_bar = jnp.where(newly_finished, bar_mean[:, None], new_bar)

        new_h = _gather_beams(h_new, sparent, axis=2)
        new_c = _gather_beams(c_new, sparent, axis=2)

        # append-only history records (no per-step history gathers): the
        # token each slot just chose, its state backpointer, and the RAW
        # computed alpha per slot — lineage is applied once, post-loop
        tok_rec = jax.lax.dynamic_update_index_in_dim(
            tok_rec, new_token, t, axis=0)
        sparent_rec = jax.lax.dynamic_update_index_in_dim(
            sparent_rec, sparent.astype(jnp.int32), t, axis=0)
        alpha_rec = jax.lax.dynamic_update_index_in_dim(
            alpha_rec, alpha.astype(jnp.float32), t, axis=0)

        return (new_token, new_scores, new_finished, new_flen, new_bar,
                new_h, new_c, tok_rec, sparent_rec, alpha_rec), None

    carry0 = (cur_tok0, scores0, finished0, flen0, bar0, h0, c0,
              tok_rec0, sparent_rec0, alpha_rec0)
    if early_exit:
        def cond(state):
            t, carry = state[0], state[1:]
            return jnp.logical_and(t <= S, ~jnp.all(carry[2]))

        def body(state):
            t, carry = state[0], state[1:]
            new_carry, _ = step_fn(carry, (t, step_rngs[t]))
            return (t + 1,) + new_carry

        state = jax.lax.while_loop(cond, body, (jnp.int32(0),) + carry0)
        (_, scores, finished, flen, bar, _, _,
         tok_rec, sparent_rec, alpha_rec) = state[1:]
    else:
        ts = jnp.arange(S + 1)
        ((_, scores, finished, flen, bar, _, _,
          tok_rec, sparent_rec, alpha_rec), _) = jax.lax.scan(
            step_fn, carry0, (ts, step_rngs))

    # ---- lineage reconstruction (one reverse scan, O(S) tiny gathers) -----
    # Walk the ancestor chain from the final slots back to step 0.  At step t
    # the invariant is anc == A(t), the ancestor of each final slot under the
    # parent relation; the token the final slot's history shows at position
    # t+1 is the one A(t) chose, and its alpha row t is the raw alpha of
    # sparent[t, A(t)] (the reference gathers states by sparent — identity at
    # t=0, see the note above).  Unexecuted early-exit steps recorded PAD
    # tokens and identity backpointers, so walking through them is a no-op.
    anc0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (b, k))

    def back_step(anc, xs):
        tok_t, sp_t, alpha_t = xs                     # (B,k), (B,k), (B,k,L)
        tok_row = jnp.take_along_axis(tok_t, anc, axis=1)
        asp = jnp.take_along_axis(sp_t, anc, axis=1)  # == A(t-1) for t >= 1
        alpha_row = _gather_beams(alpha_t, asp, axis=1)
        return asp, (tok_row, alpha_row)

    _, (tok_rows, alpha_rows) = jax.lax.scan(
        back_step, anc0, (tok_rec, sparent_rec, alpha_rec), reverse=True)
    tokens = jnp.concatenate(
        [jnp.full((b, k, 1), start_i, jnp.int32),
         jnp.moveaxis(tok_rows, 0, 2)], axis=2)       # (B, k, S+2)
    alphas = jnp.moveaxis(alpha_rows, 0, 2)           # (B, k, S+1, L)

    # max_gen_length flush (model.py:441-446): incomplete beams keep score,
    # length = S, BAR term = final live mean
    final_live = ~finished
    final_bar_mean = -(jnp.sum(jnp.where(final_live, scores, 0.0), axis=1)
                       / jnp.maximum(jnp.sum(final_live, axis=1), 1))
    flen = jnp.where(finished, flen, S)
    bar = jnp.where(finished, bar, final_bar_mean[:, None])

    lf = jnp.maximum(flen.astype(jnp.float32), 1.0)
    if rescore_method == "LN":
        rescored = scores / lf
    elif rescore_method == "WR":
        rescored = scores + rescore_reward * lf
    elif rescore_method == "BAR":
        rescored = scores + rescore_reward * bar
    else:
        rescored = scores
    perplexity = jnp.exp(-scores / lf)

    return BeamResult(tokens=tokens, lengths=flen, raw_scores=scores,
                      scores=rescored, perplexity=perplexity, alphas=alphas)


# ---------------------------------------------------------------------------


def greedy_decode(params: Dict, cfg: SATConfig, annotations: jax.Array,
                  *, max_gen_length: int = 32,
                  temperature: float = 1.0, fused: bool = False,
                  early_exit: bool = False,
                  rescore_method: Optional[str] = None,
                  rescore_reward: float = 0.5) -> BeamResult:
    """Throughput fast path: beam width 1 without candidate machinery.

    Equivalent to beam_search(beamk=1, sample_method="beam") but with a plain
    per-step argmax — the kernel the >=5k imgs/sec/chip target is measured on.
    `scores` follows the same contract: raw cumulative logprob unless a
    rescore_method is given (it used to be unconditionally length-normalized,
    silently disagreeing with beam_search(beamk=1) for the same caption).
    With ``fused=True`` (single-layer LSTM only) the per-step compute runs in
    the fused Pallas kernel (kernels/decoder_step.py).

    early_exit=True runs the time loop as a ``lax.while_loop`` that stops as
    soon as every caption in the batch has emitted <END> — the batched
    equivalent of the reference's serial-loop break (model.py:427-446).
    Outputs are EXACT vs the scan (finished rows only append PAD and their
    scores/alphas freeze); the win is data-dependent: short-caption batches
    skip the tail steps the fixed scan always pays."""
    b, L, d = annotations.shape
    S = max_gen_length
    v = cfg.vocab_size
    vocab = cfg.vocab_stoi
    pad_i, unk_i = int(vocab["<PAD>"]), int(vocab["<UNK>"])
    start_i, end_i = int(vocab["<START>"]), int(vocab["<END>"])

    att_enc = attention_precompute(params, annotations)
    h, c = init_lstm_state(params, annotations, cfg)

    if fused == "loop":
        # whole decode loop in one Pallas kernel (kernels/greedy_loop.py)
        from ..kernels.greedy_loop import (greedy_loop_decode,
                                           greedy_loop_supported)
        assert greedy_loop_supported(cfg, L), \
            "greedy loop kernel: decoder_layers must be 1 and the weight set must fit VMEM"
        tokens, alphas, scores, flen, finished = greedy_loop_decode(
            params, cfg, annotations, att_enc, h[0], c[0],
            max_gen_length=S, temperature=temperature)
        flen = jnp.where(finished, flen, S)
        lf = jnp.maximum(flen.astype(jnp.float32), 1.0)
        rescored = _rescore_single(scores, lf, rescore_method, rescore_reward)
        return BeamResult(tokens=tokens[:, None], lengths=flen[:, None],
                          raw_scores=scores[:, None],
                          scores=rescored[:, None],
                          perplexity=jnp.exp(-scores / lf)[:, None],
                          alphas=alphas[:, None])

    if fused:
        from ..kernels.decoder_step import (fused_decoder_step,
                                            fused_output_logits,
                                            fused_step_supported,
                                            pack_fused_weights)
        assert fused_step_supported(cfg), "fused path needs decoder_layers=1"
        fw = pack_fused_weights(params, cfg, dtype=annotations.dtype)

        def step_compute(prev_embed, h, c):
            t, h1, c1, zt, alpha = fused_decoder_step(
                fw, cfg, prev_embed, h[0], c[0], annotations, att_enc)
            logits = fused_output_logits(params, cfg, t)
            return logits, h1[None], c1[None], alpha
    else:
        def step_compute(prev_embed, h, c):
            logits, h1, c1, _, alpha = decoder_step(
                params, cfg, prev_embed, h, c, annotations, att_enc)
            return logits, h1, c1, alpha

    always_mask = jnp.zeros((v,)).at[jnp.array([start_i, pad_i])].set(NEG_INF)
    step0_mask = always_mask.at[jnp.array([end_i, unk_i])].set(NEG_INF)

    tokens0 = jnp.full((b, S + 2), pad_i, jnp.int32).at[:, 0].set(start_i)
    alphas0 = jnp.zeros((b, S + 1, L), jnp.float32)

    def step_fn(carry, t):
        tokens, scores, finished, flen, h, c, alphas = carry
        prev_words = jax.lax.dynamic_index_in_dim(tokens, t, axis=1, keepdims=False)
        prev_embed = embed_tokens(params, prev_words, cfg)
        logits, h, c, alpha = step_compute(prev_embed, h, c)
        # argmax + logsumexp instead of materializing the full (B, V) fp32
        # log_softmax array (reference-parity: Z includes masked tokens,
        # selection excludes them — model.py:330-340)
        scaled = logits.astype(jnp.float32) / temperature
        sel = scaled + jnp.where(t == 0, step0_mask, always_mask)
        token = jnp.argmax(sel, axis=-1).astype(jnp.int32)
        tok_logp = (jnp.take_along_axis(scaled, token[:, None], axis=1)[:, 0]
                    - jax.scipy.special.logsumexp(scaled, axis=-1))
        token = jnp.where(finished, pad_i, token)
        scores = jnp.where(finished, scores, scores + tok_logp)
        # finished rows freeze their alpha buffer too (exactness vs the
        # reference, which stops computing retired rows entirely)
        alphas = jax.lax.dynamic_update_index_in_dim(
            alphas, jnp.where(finished[:, None], 0.0,
                              alpha.astype(jnp.float32)), t, axis=1)
        newly = jnp.logical_and(~finished, token == end_i)
        flen = jnp.where(newly, t, flen)
        finished = jnp.logical_or(finished, newly)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, token, t + 1, axis=1)
        return (tokens, scores, finished, flen, h, c, alphas)

    carry0 = (tokens0, jnp.zeros((b,)), jnp.zeros((b,), bool),
              jnp.zeros((b,), jnp.int32), h, c, alphas0)
    if early_exit:
        def cond(state):
            t, finished = state[0], state[1][2]
            return jnp.logical_and(t <= S, ~jnp.all(finished))

        def body(state):
            t, carry = state
            return (t + 1, step_fn(carry, t))

        _, (tokens, scores, finished, flen, _, _, alphas) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), carry0))
    else:
        (tokens, scores, finished, flen, _, _, alphas), _ = jax.lax.scan(
            lambda c, t: (step_fn(c, t), None), carry0, jnp.arange(S + 1))
    flen = jnp.where(finished, flen, S)
    lf = jnp.maximum(flen.astype(jnp.float32), 1.0)
    rescored = _rescore_single(scores, lf, rescore_method, rescore_reward)
    return BeamResult(tokens=tokens[:, None], lengths=flen[:, None],
                      raw_scores=scores[:, None], scores=rescored[:, None],
                      perplexity=jnp.exp(-scores / lf)[:, None],
                      alphas=alphas[:, None])
