"""Smoke tests shaped like BASELINE.json's benchmark configs (tiny sizes):
config 2/3 (resnet encoder + beam-search decode with BLEU), config 5
(resnet50-style training with doubly-stochastic loss + one-cycle LR,
data-parallel over the 8-device mesh)."""

import numpy as np
import jax
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("bc")
    return make_synthetic_dataset(str(out), n_train=16, n_val=8, n_test=8,
                                  image_size=32, max_cap_length=6)


def test_resnet_one_cycle_dp_training(synth, tmp_path):
    """BASELINE config 5 shape: resnet + teacher forcing + one-cycle LR +
    doubly-stochastic loss, data-parallel over the virtual mesh, bf16."""
    cfg = SATConfig(json=synth, batch=8, epochs=2, input_size=32,
                    encoder_arch="resnet18", encoder_dim=32, embed_dim=16,
                    attention_dim=16, decoder_dim=32, precision=16,
                    decoder_tf="inv_sigmoid", scheduler="one_cycle",
                    att_gamma=1.0, val_interval=2, val_beamk=3, val_max_len=5,
                    deep_output=True, seed=0)
    t = Trainer(cfg, log_root=str(tmp_path / "logs"))
    assert len(jax.devices()) == 8
    lr_start = t.scheduler.current_lrs(0)["decoder"]
    metrics = t.fit()
    assert np.isfinite(metrics["bleu4"])
    # one-cycle ran to its final_div floor (model.py:806-815 semantics)
    lr_end = t.scheduler.current_lrs(t.global_step)["decoder"]
    assert lr_end < lr_start
    assert lr_end == pytest.approx(1e-3 / 25 / 1e4, rel=0.5)


def test_beam_validation_with_bucket_sampler(synth, tmp_path):
    """BASELINE config 3 shape: bucket-sampled batches + on-device beam
    search validation with length-normalized rescoring."""
    cfg = SATConfig(json=synth, batch=8, epochs=1, input_size=32,
                    encoder_arch="squeezenet1_1", encoder_dim=24, embed_dim=12,
                    attention_dim=12, decoder_dim=24, bucket_sampler=True,
                    decoder_tf="always", val_interval=1, val_beamk=3,
                    val_max_len=5, seed=0)
    t = Trainer(cfg, log_root=str(tmp_path / "logs"))
    metrics = t.fit()
    assert {"bleu1", "bleu4", "gleu", "perplexity"} <= set(metrics)
