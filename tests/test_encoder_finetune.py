"""Encoder finetuning actually trains the encoder (round-5 regression).

Round-5 discovery: `encoder_finetune_after=0` builds NO encoder optimizer
group (reference parity, model.py:745-746 gates on `>0`), so encoder grads
are dead code and XLA DCE's the entire encoder backward — the "finetune" and
"frozen" train-step programs compile to the IDENTICAL executable.  Every
round-3/4 soak rung and the bench "finetune" metric silently ran frozen.

Pins:
1. finetune_after=1: step 0 (frozen phase) leaves encoder params untouched,
   step 1+ (finetune phase) changes them.
2. finetune_after=0 with encoder_lr>0: loud warning at validate(); encoder
   never changes (reference parity).
3. The frozen and finetune step programs DIFFER when the encoder group
   exists (the lowered HLO must not be identical — the DCE trap).
"""

import numpy as np
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # Trainer construction compiles; not fast-tier


def _cfg(json_path, **kw):
    base = dict(json=json_path, batch=8, epochs=1, input_size=32,
                encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                embed_dim=8, attention_dim=8, decoder_dim=16,
                val_interval=100, seed=7, encoder_lr=1e-3)
    base.update(kw)
    return SATConfig(**base)


def _enc_flat(trainer):
    import jax
    return np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(
                               jax.device_get(
                                   trainer.variables["params"]["encoder"]))])


def test_finetune_after_one_trains_encoder_from_step_one(tmp_path):
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    t = Trainer(_cfg(json_path, encoder_finetune_after=1),
                log_root=str(tmp_path / "l"))
    e0 = _enc_flat(t)
    t.train_epoch(max_batches=1)          # step 0: frozen phase
    assert t.global_step == 1
    e1 = _enc_flat(t)
    np.testing.assert_array_equal(e0, e1)  # untouched while frozen
    t.train_epoch(max_batches=1)          # step 1: finetune phase
    assert t.global_step == 2
    e2 = _enc_flat(t)
    assert np.abs(e2 - e1).sum() > 0, \
        "encoder params did not move in the finetune phase"


def test_finetune_after_zero_never_trains_encoder(tmp_path, capsys):
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    cfg = _cfg(json_path, encoder_finetune_after=0)
    cfg.validate()
    assert "encoder will NEVER train" in capsys.readouterr().err
    t = Trainer(cfg, log_root=str(tmp_path / "l"))
    e0 = _enc_flat(t)
    t.train_epoch(max_batches=2)
    e1 = _enc_flat(t)
    np.testing.assert_array_equal(e0, e1)


def test_frozen_and_finetune_programs_differ(tmp_path):
    """The DCE trap itself: when the encoder group exists, the
    train_encoder=True and =False programs must NOT lower identically
    (with finetune_after=0 they did — that's how the bug hid)."""
    import jax
    import jax.numpy as jnp
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    t = Trainer(_cfg(json_path, encoder_finetune_after=1),
                log_root=str(tmp_path / "l"))
    rng = np.random.default_rng(0)
    batch = {"images": jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3)),
                                   jnp.uint8),
             "captions": jnp.asarray(rng.integers(1, 10, (8, 5, 6)),
                                     jnp.int32),
             "lengths": jnp.asarray(rng.integers(2, 6, (8, 5)), jnp.int32)}
    lrs = {k: jnp.asarray(1e-4, jnp.float32)
           for k in ("decoder", "embedding", "encoder")}
    eps = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    texts = {}
    for te in (True, False):
        texts[te] = t._jit_train_step.lower(
            t.variables, t.opt_state, batch, lrs, eps, key,
            train_encoder=te).as_text()
    assert texts[True] != texts[False]
