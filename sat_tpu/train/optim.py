"""Optimizer construction with the reference's param-group semantics.

Mirrors reference configure_optimizers (model.py:720-817):

* add_weight_decay: 1-D params (biases, BN scales) get weight_decay=0
  (model.py:723-734).
* Groups: decoder modules @ decoder_lr (+wd on >=2-D); embedding @
  embedding_lr wd=0 — only when not weight-tied and embedding_lr>0
  (model.py:739-742; tied weights ride in the decoder group); encoder @
  encoder_lr (+wd) only when encoder_finetune_after>0 and encoder_lr>0
  (model.py:745-746).  Params in no group are frozen — notably the encoder
  when finetuning is off (replacing requires_grad=False, model.py:23-25).
* SGD(+nesterov) applies wd to the gradient before momentum (torch semantics);
  Adam applies L2-style wd before moments; AdamW decoupled after moments.

LRs are NOT baked into the chains: the trainer multiplies each group's updates
by that group's current LR (a runtime scalar from train/schedules.py), so
plateau/restart changes never recompile."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import SATConfig

FROZEN = "frozen"


def label_params(cfg: SATConfig, params: Dict[str, Any]):
    """Assign every param leaf a group label (pytree of strings)."""
    emb_trainable = cfg.embedding_lr > 0 and not cfg.weight_tying
    enc_trainable = cfg.encoder_finetune_after > 0 and cfg.encoder_lr > 0

    def visit(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "decoder":
            name = path[1].key if hasattr(path[1], "key") else str(path[1])
            if name == "embedding":
                if cfg.weight_tying and cfg.deep_output:
                    return "decoder_decay"      # tied: lives in the output group
                return "embedding" if emb_trainable else FROZEN
            return "decoder_decay" if leaf.ndim > 1 else "decoder_nodecay"
        if top == "encoder":
            if not enc_trainable:
                return FROZEN
            return "encoder_decay" if leaf.ndim > 1 else "encoder_nodecay"
        return FROZEN

    return jax.tree_util.tree_map_with_path(visit, params)


def _group_chain(cfg: SATConfig, weight_decay: float) -> optax.GradientTransformation:
    if cfg.opt == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if cfg.momentum:
            parts.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
        parts.append(optax.scale(-1.0))
        return optax.chain(*parts)
    if cfg.opt == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))  # L2-style
        parts += [optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
                  optax.scale(-1.0)]
        return optax.chain(*parts)
    if cfg.opt == "adamw":
        parts = [optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2)]
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))  # decoupled
        parts.append(optax.scale(-1.0))
        return optax.chain(*parts)
    raise ValueError(cfg.opt)


def _clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics — what Lightning's
    gradient_clip_algorithm="norm" invokes for the reference
    (train.py:273-275): scale = max_norm / (global_norm + 1e-6), clamped to
    <= 1.  optax.clip_by_global_norm omits torch's 1e-6 eps, a ~1e-6
    relative difference on every binding step; matching it exactly keeps the
    literal-reference trajectory suite (test_train_trajectory.py) tight."""

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn)


def build_optimizer(cfg: SATConfig, params: Dict[str, Any]
                    ) -> Tuple[optax.GradientTransformation, Any]:
    """Returns (transformation, label_tree).  Chains exclude the LR factor."""
    labels = label_params(cfg, params)
    transforms = {
        "decoder_decay": _group_chain(cfg, cfg.weight_decay),
        "decoder_nodecay": _group_chain(cfg, 0.0),
        "embedding": _group_chain(cfg, 0.0),
        "encoder_decay": _group_chain(cfg, cfg.weight_decay),
        "encoder_nodecay": _group_chain(cfg, 0.0),
        FROZEN: optax.set_to_zero(),
    }
    clip = (optax.clip(cfg.clip_value) if cfg.grad_clip == "value"
            else _clip_by_global_norm_torch(cfg.clip_value)) \
        if cfg.clip_value > 0 else optax.identity()
    tx = optax.chain(clip, optax.multi_transform(transforms, labels))
    return tx, labels


LABEL_TO_LR_GROUP = {
    "decoder_decay": "decoder", "decoder_nodecay": "decoder",
    "embedding": "embedding",
    "encoder_decay": "encoder", "encoder_nodecay": "encoder",
    FROZEN: None,
}


def apply_group_lrs(updates: Dict[str, Any], labels: Any,
                    lrs: Dict[str, jax.Array]) -> Dict[str, Any]:
    """Scale each update leaf by its group's current LR (runtime scalars)."""
    def scale(u, lab):
        g = LABEL_TO_LR_GROUP[lab]
        return u if g is None else u * lrs[g]
    return jax.tree_util.tree_map(scale, updates, labels)
