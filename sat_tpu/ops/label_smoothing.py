"""Label-smoothed NLL loss with validity masking.

Replaces the reference's LabelSmoothing-on-packed-sequences (reference:
util.py:91-112 applied to pack_padded_sequence data at model.py:553-554, 592).
On TPU we keep static shapes: instead of packing, every (batch, time) position
gets a per-position loss and the mean is taken over valid positions only
(``mask = lengths > t``), which is numerically identical to the packed mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array, smoothing: float = 0.0) -> jax.Array:
    """loss = mean over valid positions of confidence*nll + smoothing*(-mean logprob).

    logits: (..., V) float; targets: (...) int; mask: (...) bool/float.
    Smoothing of 0 is exactly cross entropy (reference: util.py:96-112).
    """
    confidence = 1.0 - smoothing
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    per_pos = confidence * nll + smoothing * smooth
    mask = mask.astype(per_pos.dtype)
    return jnp.sum(per_pos * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_token_accuracy(logits: jax.Array, targets: jax.Array,
                          mask: jax.Array) -> jax.Array:
    """Token accuracy over valid positions (reference: model.py:596-597)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets).astype(jnp.float32) * mask.astype(jnp.float32)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)
