"""Self-contained checkpointing: weights + optimizer state + full config +
vocabulary in one file, exactly the deployment-artifact property of the
reference's Lightning checkpoints (reference: model.py:142 save_hyperparameters
bundles vocab_stoi/itos; SURVEY.md §3.3 — every tool reconstructs the model
from the checkpoint alone).

File format: msgpack (flax.serialization) with a JSON config header — a single
`.ckpt` file like the reference's.  Managers replicate the reference callbacks:
top-k by monitor with '{epoch}-{step}-{bleu4:.4f}' names + save_last
(reference: train.py:180-188) and RestartCheckpoint snapshots whenever the LR
*rises* after warmup, i.e. at each cosine warm restart (reference:
util.py:167-183)."""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..config import SATConfig

_MAGIC = b"SATTPU1\n"


def save_checkpoint(path: str, cfg: SATConfig, tree: Dict[str, Any]) -> None:
    """tree: {"params", "state", "opt_state"?, "step"?, "epoch"?, ...}."""
    # str leaves (top-k registry names) pass through: msgpack handles raw
    # strings natively but np.asarray(str) makes an unrestorable '<U*' array
    tree = jax.tree_util.tree_map(
        lambda x: x if isinstance(x, str) else np.asarray(x), tree)
    # to_state_dict converts tuples/namedtuples (optax states) to dicts
    payload = serialization.msgpack_serialize(serialization.to_state_dict(tree))
    header = cfg.to_json().encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(payload)


def read_checkpoint_config(path: str) -> SATConfig:
    """Read only the JSON config header (cheap; no tensor payload)."""
    with open(path, "rb") as f:
        assert f.read(len(_MAGIC)) == _MAGIC, f"not a SAT-TPU checkpoint: {path}"
        (hlen,) = struct.unpack("<Q", f.read(8))
        return SATConfig.from_json(f.read(hlen).decode())


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Tuple[SATConfig, Dict[str, Any]]:
    """Returns (config, tree).  With `target`, the tree is restored into the
    target's exact pytree structure (needed for optax states)."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic == _MAGIC, f"not a SAT-TPU checkpoint: {path}"
        (hlen,) = struct.unpack("<Q", f.read(8))
        cfg = SATConfig.from_json(f.read(hlen).decode())
        payload = f.read()
    if target is not None:
        tree = serialization.from_bytes(target, payload)
    else:
        tree = serialization.msgpack_restore(payload)
    return cfg, tree


def load_model_from_checkpoint(path: str):
    """Reconstruct (model, variables, extras) from the checkpoint alone —
    the reference's SAT.load_from_checkpoint contract (SURVEY.md §3.3)."""
    from ..models.encoder import probe_encoder
    from ..models.model import SATModel

    import jax.numpy as jnp

    cfg, tree = load_checkpoint(path)
    _, grid = probe_encoder(cfg)
    model = SATModel(cfg, grid)
    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    variables = {"params": to_dev(tree["params"]), "state": to_dev(tree["state"])}
    extras = {k: tree[k] for k in tree if k not in ("params", "state", "opt_state")}
    extras["opt_state_raw"] = tree.get("opt_state")
    return model, variables, extras


class TopKCheckpointManager:
    """ModelCheckpoint(mode=max, save_top_k, save_last) (reference:
    train.py:180-188)."""

    def __init__(self, dirpath: str, monitor: str = "bleu4", save_top_k: int = 1,
                 write: bool = True):
        self.dirpath = dirpath
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.write = write  # multi-host: only process 0 touches the filesystem
        self.best: List[Tuple[float, str]] = []  # (value, path)
        if write:
            os.makedirs(dirpath, exist_ok=True)

    @property
    def best_value(self) -> Optional[float]:
        return max(v for v, _ in self.best) if self.best else None

    def state_dict(self) -> Dict[str, Any]:
        """Registry persisted inside every checkpoint so a resumed run keeps
        enforcing save_top_k against the PRE-resume bests (Lightning persists
        ModelCheckpoint.best_k_models the same way; without this a worse
        post-resume value is saved as 'top-k' and the historical best can
        never be evicted)."""
        return {str(i): {"value": float(v), "name": os.path.basename(p)}
                for i, (v, p) in enumerate(sorted(self.best))}

    def load_state_dict(self, sd: Dict[str, Any], base_dir: str) -> None:
        """base_dir: directory of the resumed checkpoint — pre-resume top-k
        files live there, not in the new run's version dir."""
        self.best = [(float(e["value"]), os.path.join(base_dir, str(e["name"])))
                     for e in sd.values()]

    def on_validation_end(self, cfg: SATConfig, tree_fn,
                          metrics: Dict[str, float], epoch: int, step: int) -> None:
        """tree_fn: lazy () -> checkpoint tree.  Skipped when metrics are
        empty; otherwise EVERY process calls it (save_last refreshes each
        validation, and the gather inside may be a collective) and only the
        writer touches the filesystem."""
        if not metrics:
            return
        value = float(metrics.get(self.monitor, float("-inf")))
        name = f"epoch={epoch}-step={step}-{self.monitor}={value:.4f}.ckpt"
        path = os.path.join(self.dirpath, name)
        # Decide what will be written BEFORE fetching the tree: the fetch is
        # the expensive part (one full-params+opt-state device->host
        # transfer), and with cfg.save_last_every > 1 most validations write
        # nothing at all.  The decision is deterministic across processes
        # (metrics are identical on every host), so the collective inside
        # tree_fn stays aligned.
        evict = None
        save = False
        if self.save_top_k <= 0:
            pass
        elif len(self.best) < self.save_top_k:
            save = True
        else:
            worst = min(self.best)
            if value > worst[0]:
                save = True
                evict = worst
        self._val_count = getattr(self, "_val_count", 0) + 1
        every = max(int(getattr(cfg, "save_last_every", 1) or 1), 1)
        # save_last=True parity is every=1 (reference: train.py:187); larger
        # values are the soak-ladder lever — a skipped refresh only costs
        # resume granularity (top-k + restart ckpts still exist)
        save_last = self._val_count % every == 0
        if not (save or save_last):
            return
        if save:
            self.best.append((value, path))
            if evict is not None:
                self.best.remove(evict)
        tree = tree_fn() if callable(tree_fn) else tree_fn
        if not self.write:
            return
        # registry updated FIRST so the file being written includes itself
        # (Lightning's best_k_models persistence order)
        tree = dict(tree, top_k=self.state_dict())
        if save:
            save_checkpoint(path, cfg, tree)
            if evict is not None and os.path.exists(evict[1]):
                os.remove(evict[1])
        if save_last:
            save_checkpoint(os.path.join(self.dirpath, "last.ckpt"), cfg,
                            tree)


class RestartCheckpointManager:
    """Snapshot on LR increase after warmup (reference: util.py:167-183)."""

    def __init__(self, dirpath: str, warmup_steps: int = 0, write: bool = True):
        self.dirpath = dirpath
        self.warmup_steps = warmup_steps
        self.prev_lr = 0.0
        self.write = write
        if write:
            os.makedirs(dirpath, exist_ok=True)

    def on_train_batch_end(self, cfg: SATConfig, tree_fn, global_step: int,
                           current_lr: float) -> Optional[str]:
        """tree_fn: lazy () -> checkpoint tree (avoids host transfer unless saving)."""
        if global_step <= self.warmup_steps:
            return None
        if self.prev_lr == 0.0:
            self.prev_lr = current_lr
        saved = None
        if current_lr > self.prev_lr:
            # all processes call tree_fn (it may gather sharded leaves —
            # a collective); only the writer process hits the filesystem
            tree = tree_fn()
            if self.write:
                saved = os.path.join(self.dirpath, f"restart-{global_step}.ckpt")
                save_checkpoint(saved, cfg, tree)
        self.prev_lr = current_lr
        return saved


def load_any_checkpoint(path: str):
    """(model, variables) from a SAT-TPU **or** reference-Lightning .ckpt.

    Every CLI takes either format, so a reference user can point their
    existing trained checkpoints at SAT-TPU tools directly (the BLEU-parity
    harness path)."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # zip -> torch.save -> reference Lightning checkpoint
        from ..models.lightning_import import load_reference_checkpoint
        from ..models.model import SATModel
        cfg, variables, grid = load_reference_checkpoint(path)
        return SATModel(cfg, grid), variables
    model, variables, _ = load_model_from_checkpoint(path)
    return model, variables
