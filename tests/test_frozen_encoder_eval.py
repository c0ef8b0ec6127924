"""Frozen-phase eval-mode encoder (cfg.frozen_encoder_eval, VERDICT r3 #5).

Pins: with the flag ON and the encoder frozen, the train step (1) leaves BN
batch stats untouched (running-stat inference BN), (2) routes through the
folded shufflenet encoder path, (3) still updates the decoder; with the
flag OFF the reference semantics hold (frozen encoder but train-mode BN —
batch stats keep updating, reference model.py:22-25 + Lightning train())."""

import jax
import numpy as np
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow


def _trainer(tmp_path, tag, **kw):
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    cfg = SATConfig(json=json_path, batch=8, epochs=1, input_size=32,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                    embed_dim=8, attention_dim=8, decoder_dim=16,
                    decoder_tf="always", val_interval=100, seed=0,
                    encoder_finetune_after=-1, **kw)
    return Trainer(cfg, log_root=str(tmp_path / f"logs_{tag}"))


def _flat(tree):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(tree)])


def test_frozen_eval_keeps_batch_stats_and_trains_decoder(tmp_path):
    t = _trainer(tmp_path, "on", frozen_encoder_eval=True)
    bs0 = _flat(t.variables["state"]["batch_stats"])
    enc0 = _flat(t.variables["params"]["encoder"])
    dec0 = _flat(t.variables["params"]["decoder"])
    m = t.train_epoch()
    assert np.isfinite(m["loss"])
    np.testing.assert_array_equal(
        bs0, _flat(t.variables["state"]["batch_stats"]))
    np.testing.assert_array_equal(enc0, _flat(t.variables["params"]["encoder"]))
    assert not np.array_equal(dec0, _flat(t.variables["params"]["decoder"]))


def test_default_frozen_path_updates_batch_stats(tmp_path):
    t = _trainer(tmp_path, "off")
    bs0 = _flat(t.variables["state"]["batch_stats"])
    enc0 = _flat(t.variables["params"]["encoder"])
    t.train_epoch()
    # reference semantics: frozen weights, but BN stats keep moving
    assert not np.array_equal(bs0, _flat(t.variables["state"]["batch_stats"]))
    np.testing.assert_array_equal(enc0, _flat(t.variables["params"]["encoder"]))
