"""Teacher-forced SAT forward pass + loss, as a single static-shape lax.scan.

TPU-native replacement for the reference's ``SAT.train_batch`` Python timestep
loop with its shrinking active batch (reference: model.py:474-557).  Differences,
all XLA-dictated and numerically equivalent:

* The per-step ``incomplete_idxs`` batch shrinking (model.py:510-513) becomes a
  validity mask ``lengths > t``; every row computes every step, masked rows are
  zeroed where they would have stayed unwritten.
* ``pack_padded_sequence`` loss masking (model.py:553-554) becomes a
  mask-weighted mean (ops/label_smoothing.py) — identical value.
* Scheduled sampling draws ONE uniform per step for the whole batch, exactly
  like the reference's ``torch.rand(1) <= epsilon`` (model.py:518), with the
  hard-coded ``step <= 2`` ground-truth floor.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SATConfig
from ..ops.label_smoothing import label_smoothing_loss, masked_token_accuracy
from .decoder import (attention_precompute, decoder_step, embed_tokens,
                      fast_key, init_lstm_state, _dropout)


def repeat_annotations(annotations: jax.Array, n_refs: int) -> jax.Array:
    """repeat_interleave on the batch dim: one image forward reused for all
    reference captions (reference: model.py:487; dev/todo.txt:51)."""
    return jnp.repeat(annotations, n_refs, axis=0)


def train_forward(params: Dict, cfg: SATConfig, annotations: jax.Array,
                  encoded_captions: jax.Array, lengths: jax.Array,
                  epsilon: jax.Array,
                  rng: Optional[jax.Array] = None,
                  train: bool = True) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Teacher-forced decode of a caption batch.

    annotations: (N, L, D) — already repeated to match captions.
    encoded_captions: (N, T) int32; lengths: (N,) int32 (targets per caption).
    epsilon: scalar teacher-forcing probability.
    Returns (logits (N, T-1, V), targets (N, T-1), alphas (N, T-1, L))."""
    n, total_t = encoded_captions.shape
    num_steps = total_t - 1
    targets = encoded_captions[:, 1:]

    if rng is None:
        rng = jax.random.PRNGKey(0)
        train = False
    rng_init, rng_tf, rng_drop = jax.random.split(rng, 3)

    # batch_reshape: the reference's exact (cross-row) init state layout —
    # see init_lstm_state docstring
    h, c = init_lstm_state(params, annotations, cfg,
                           rng_init if train and cfg.dropout > 0 else None,
                           batch_reshape=True)
    att_enc = attention_precompute(params, annotations)

    # Per-step scalar coin flips for scheduled sampling (model.py:518)
    coins = jax.random.uniform(rng_tf, (num_steps,)) <= epsilon
    # bulk dropout-mask bits via the hardware RNG (threefry-derived stream
    # structure, see decoder.fast_key; cfg.fast_rng=False -> pure threefry)
    drop_rngs = jax.random.split(fast_key(rng_drop, cfg.fast_rng), num_steps)

    v = cfg.vocab_size
    init_prev_logits = jnp.zeros((n, v), jnp.float32)

    def step_fn(carry, xs):
        h, c, prev_logits = carry
        t, coin, drop_rng = xs
        use_gt = jnp.logical_or(t <= 2, coin)
        gt_words = jax.lax.dynamic_index_in_dim(encoded_captions, t, axis=1,
                                                keepdims=False)
        pred_words = jnp.argmax(prev_logits, axis=-1).astype(gt_words.dtype)
        prev_words = jnp.where(use_gt, gt_words, pred_words)

        # independent draws per regularizer (reference: model.py:527 embedding
        # dropout and model.py:128 output dropout are separate nn.Dropout
        # modules) — reusing one key would make the two masks bit-identical
        # whenever the shapes and rates coincide
        emb_rng, out_rng = jax.random.split(drop_rng)
        prev_embed = embed_tokens(params, prev_words, cfg)
        if train and cfg.embedding_dropout > 0:
            prev_embed = _dropout(prev_embed, cfg.embedding_dropout, emb_rng)

        logits, h, c, _, alpha = decoder_step(
            params, cfg, prev_embed, h, c, annotations, att_enc,
            out_rng if train and cfg.dropout > 0 else None)
        logits = logits.astype(jnp.float32)

        active = (lengths > t)[:, None]
        alpha = jnp.where(active, alpha, 0.0)  # zeros where the ref never writes
        return (h, c, logits), (logits, alpha)

    ts = jnp.arange(num_steps)
    (_, _, _), (logits, alphas) = jax.lax.scan(
        step_fn, (h, c, init_prev_logits), (ts, coins, drop_rngs))
    # scan stacks on axis 0 (time): -> (N, T-1, ...)
    logits = jnp.moveaxis(logits, 0, 1)
    alphas = jnp.moveaxis(alphas, 0, 1)
    return logits, targets, alphas


def train_forward_loss(params: Dict, cfg: SATConfig, annotations: jax.Array,
                       encoded_captions: jax.Array, lengths: jax.Array,
                       epsilon: jax.Array,
                       rng: Optional[jax.Array] = None,
                       train: bool = True) -> Dict[str, jax.Array]:
    """Teacher-forced forward with the loss computed INSIDE the scan.

    Numerically identical to train_forward + sat_loss, but never materializes
    the (N, T, V) logits tensor: each step contributes its masked CE/accuracy
    terms to scalar accumulators and its alpha to a running (N, L) sum, and
    ``jax.checkpoint`` recomputes step intermediates in the backward pass.
    On a v5e this removes >1 GB/step of HBM traffic at production batch sizes
    (the logits stack + its gradient + the saved softmax residuals), which is
    what actually bounds the reference-shaped training step."""
    n, total_t = encoded_captions.shape
    num_steps = total_t - 1
    targets = encoded_captions[:, 1:]
    v = cfg.vocab_size
    confidence = 1.0 - cfg.label_smoothing

    if rng is None:
        rng = jax.random.PRNGKey(0)
        train = False
    rng_init, rng_tf, rng_drop = jax.random.split(rng, 3)

    h, c = init_lstm_state(params, annotations, cfg,
                           rng_init if train and cfg.dropout > 0 else None,
                           batch_reshape=True)
    att_enc = attention_precompute(params, annotations)
    coins = jax.random.uniform(rng_tf, (num_steps,)) <= epsilon
    # bulk dropout-mask bits via the hardware RNG (threefry-derived stream
    # structure, see decoder.fast_key; cfg.fast_rng=False -> pure threefry)
    drop_rngs = jax.random.split(fast_key(rng_drop, cfg.fast_rng), num_steps)

    def step_fn(carry, xs):
        h, c, prev_pred = carry
        t, coin, drop_rng = xs
        use_gt = jnp.logical_or(t <= 2, coin)
        gt_words = jax.lax.dynamic_index_in_dim(encoded_captions, t, axis=1,
                                                keepdims=False)
        prev_words = jnp.where(use_gt, gt_words, prev_pred)

        emb_rng, out_rng = jax.random.split(drop_rng)  # independent masks
        prev_embed = embed_tokens(params, prev_words, cfg)
        if train and cfg.embedding_dropout > 0:
            prev_embed = _dropout(prev_embed, cfg.embedding_dropout, emb_rng)
        logits, h, c, _, alpha = decoder_step(
            params, cfg, prev_embed, h, c, annotations, att_enc,
            out_rng if train and cfg.dropout > 0 else None)
        logits = logits.astype(jnp.float32)

        active = (lengths > t).astype(jnp.float32)                 # (N,)
        tgt = jax.lax.dynamic_index_in_dim(targets, t, axis=1, keepdims=False)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, tgt[:, None], axis=1)[:, 0]
        smooth = -jnp.mean(logprobs, axis=-1)
        per_pos = confidence * nll + cfg.label_smoothing * smooth
        pred = jnp.argmax(logits, axis=-1).astype(prev_words.dtype)

        ce_sum = jnp.sum(per_pos * active)
        correct = jnp.sum((pred == tgt).astype(jnp.float32) * active)
        alpha_step = alpha.astype(jnp.float32) * active[:, None]
        return (h, c, pred), (ce_sum, correct, jnp.sum(active), alpha_step)

    ts = jnp.arange(num_steps)
    step_fn = jax.checkpoint(step_fn)  # recompute in bwd: FLOPs < HBM here
    init_pred = jnp.zeros((n,), encoded_captions.dtype)
    (_, _, _), (ce_sums, corrects, actives, alpha_steps) = jax.lax.scan(
        step_fn, (h, c, init_pred), (ts, coins, drop_rngs))

    n_valid = jnp.maximum(actives.sum(), 1.0)
    ce = ce_sums.sum() / n_valid
    acc = corrects.sum() / n_valid
    alpha_total = alpha_steps.sum(axis=0)                          # (N, L)
    att = jnp.mean((1.0 - alpha_total) ** 2)
    loss = ce + cfg.att_gamma * att
    return {"loss": loss, "ce_loss": ce, "att_loss": att, "accuracy": acc}


def train_forward_loss_grouped(params: Dict, cfg: SATConfig,
                               annotations: jax.Array,
                               encoded_captions: jax.Array,
                               lengths: jax.Array,
                               epsilon: jax.Array,
                               rng: Optional[jax.Array] = None,
                               train: bool = True) -> Dict[str, jax.Array]:
    """train_forward_loss with the reference-caption dim kept GROUPED.

    annotations: (B, L, D) — NOT repeated; encoded_captions: (B, R, T);
    lengths: (B, R).  Numerically equivalent to repeat_annotations +
    flatten_caption_batch + train_forward_loss (pinned by
    tests/test_decoder_core.py), but the scan's attention reads each image's
    annotations and W_e·a ONCE per step instead of R times:

        zt = einsum('brl,bld->brd', alpha, annotations)

    At production shapes the repeated-annotation stream is the HBM bound of
    the whole training step (b256 x 5 refs -> 1280 x L x D loads per scan
    step, forward AND in the remat backward), which made throughput FALL
    with batch size (EXPERIMENTS.md "Training step"; VERDICT r1 #5).  The
    R-fold traffic cut applies to the two largest tensors in the loop."""
    b, r, total_t = encoded_captions.shape
    n = b * r
    num_steps = total_t - 1
    L = annotations.shape[1]
    v = cfg.vocab_size
    H = cfg.decoder_dim
    confidence = 1.0 - cfg.label_smoothing
    targets = encoded_captions[:, :, 1:]

    if rng is None:
        rng = jax.random.PRNGKey(0)
        train = False
    rng_init, rng_tf, rng_drop = jax.random.split(rng, 3)

    # Reference-parity init (init_lstm_state batch_reshape semantics over the
    # N = B*R repeated rows): the projection input rows repeat per image, so
    # repeat the cheap (B, D) mean instead of the (B, L, D) annotations.
    mean = jnp.repeat(annotations.mean(axis=1), r, axis=0)        # (N, D)
    mean = _dropout(mean, cfg.dropout,
                    rng_init if train and cfg.dropout > 0 else None)
    from .decoder import _linear
    g = _linear(params["init_proj"], _linear(params["init_factorize"], mean))
    init = g.reshape(2 * cfg.decoder_layers, n, H)
    h, c = init[: cfg.decoder_layers], init[cfg.decoder_layers:]

    att_enc = attention_precompute(params, annotations)           # (B, L, A)
    coins = jax.random.uniform(rng_tf, (num_steps,)) <= epsilon
    # bulk dropout-mask bits via the hardware RNG (threefry-derived stream
    # structure, see decoder.fast_key; cfg.fast_rng=False -> pure threefry)
    drop_rngs = jax.random.split(fast_key(rng_drop, cfg.fast_rng), num_steps)

    from .decoder import beta_gate, deep_output

    def step_fn(carry, xs):
        h, c, prev_pred = carry                   # h, c: (layers, N, H)
        t, coin, drop_rng = xs
        use_gt = jnp.logical_or(t <= 2, coin)
        gt_words = jax.lax.dynamic_index_in_dim(encoded_captions, t, axis=2,
                                                keepdims=False)   # (B, R)
        prev_words = jnp.where(use_gt, gt_words, prev_pred)

        emb_rng, out_rng = jax.random.split(drop_rng)  # independent masks
        prev_embed = embed_tokens(params, prev_words, cfg)        # (B, R, E)
        if train and cfg.embedding_dropout > 0:
            prev_embed = _dropout(prev_embed, cfg.embedding_dropout, emb_rng)

        # grouped soft attention (same math as decoder.soft_attention, with
        # annotations/att_enc broadcast over the ref dim instead of repeated)
        hidden = h[-1].reshape(b, r, H)
        att_dec = _linear(params["att_dec"], hidden)              # (B, R, A)
        att = _linear(params["f_att"],
                      jnp.tanh(att_enc[:, None] + att_dec[:, :, None]))
        att = att[..., 0] * (L ** -0.5)                           # (B, R, L)
        alpha = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(att.dtype)
        zt = jnp.einsum("brl,bld->brd", alpha, annotations)       # (B, R, D)

        beta = beta_gate(params, h[-1])                           # (N, D)
        x = jnp.concatenate([prev_embed.reshape(n, -1),
                             beta * zt.reshape(n, -1)], axis=-1)
        from ..ops.lstm import lstm_stack_step
        h, c = lstm_stack_step(x, h, c, params["lstm"])
        logits = deep_output(params, cfg, prev_embed.reshape(n, -1), h[-1],
                             zt.reshape(n, -1),
                             out_rng if train and cfg.dropout > 0 else None)
        logits = logits.astype(jnp.float32)                       # (N, V)

        active = (lengths > t).astype(jnp.float32)                # (B, R)
        tgt = jax.lax.dynamic_index_in_dim(targets, t, axis=2,
                                           keepdims=False)        # (B, R)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, tgt.reshape(n)[:, None],
                                   axis=1)[:, 0]
        smooth = -jnp.mean(logprobs, axis=-1)
        per_pos = (confidence * nll + cfg.label_smoothing * smooth
                   ).reshape(b, r)
        pred = jnp.argmax(logits, axis=-1).astype(prev_words.dtype
                                                  ).reshape(b, r)

        ce_sum = jnp.sum(per_pos * active)
        correct = jnp.sum((pred == tgt).astype(jnp.float32) * active)
        alpha_step = alpha.astype(jnp.float32) * active[:, :, None]
        return (h, c, pred), (ce_sum, correct, jnp.sum(active), alpha_step)

    ts = jnp.arange(num_steps)
    # full remat: no-remat measures 6.0k vs 10.0k imgs/s at b256 (the saved
    # step intermediates blow the HBM working set — EXPERIMENTS.md r2 sweep)
    step_fn = jax.checkpoint(step_fn)
    # unroll=2: halves scan-iteration overhead and fuses adjacent steps'
    # weight-grad accumulations; measured b256 9.5k -> 10.0k imgs/s on v5e
    # (unroll=4: 9.5k, unroll=8: 9.6k — 2 is the knee)
    init_pred = jnp.zeros((b, r), encoded_captions.dtype)
    (_, _, _), (ce_sums, corrects, actives, alpha_steps) = jax.lax.scan(
        step_fn, (h, c, init_pred), (ts, coins, drop_rngs), unroll=2)

    n_valid = jnp.maximum(actives.sum(), 1.0)
    ce = ce_sums.sum() / n_valid
    acc = corrects.sum() / n_valid
    alpha_total = alpha_steps.sum(axis=0)                         # (B, R, L)
    att = jnp.mean((1.0 - alpha_total) ** 2)
    loss = ce + cfg.att_gamma * att
    return {"loss": loss, "ce_loss": ce, "att_loss": att, "accuracy": acc}


def sat_loss(cfg: SATConfig, logits: jax.Array, targets: jax.Array,
             lengths: jax.Array, alphas: jax.Array) -> Dict[str, jax.Array]:
    """Label-smoothed CE + doubly-stochastic attention loss + token accuracy
    (reference: model.py:592-597)."""
    num_steps = logits.shape[1]
    mask = lengths[:, None] > jnp.arange(num_steps)[None, :]
    ce = label_smoothing_loss(logits, targets, mask, cfg.label_smoothing)
    # Sec 4.2.1 Eq. 14: mean over (batch, locations) of (1 - sum_t alpha)^2
    att = jnp.mean((1.0 - alphas.sum(axis=1)) ** 2)
    loss = ce + cfg.att_gamma * att
    acc = masked_token_accuracy(logits, targets, mask)
    return {"loss": loss, "ce_loss": ce, "att_loss": att, "accuracy": acc}


def flatten_caption_batch(encoded_captions: jax.Array, lengths: jax.Array
                          ) -> Tuple[jax.Array, jax.Array, int]:
    """(B, R, T), (B, R) -> (B*R, T), (B*R,) (reference: model.py:490-492)."""
    b, r, t = encoded_captions.shape
    return encoded_captions.reshape(b * r, t), lengths.reshape(b * r), r
