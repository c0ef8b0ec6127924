"""Full-loop learning test: on a solvable synthetic task (two colored halves,
deterministic caption) the whole pipeline — encoder, attention-LSTM decoder,
scheduled sampling, optimizer, beam-search validation, BLEU — must converge
to high BLEU-4 from a ~0 start.  This is the capability the reference
demonstrates with its tiny-COCO smoke runs (SURVEY.md §4.2), made assertable."""

import numpy as np
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_learnable_dataset
from sat_tpu.train.loop import Trainer


@pytest.mark.slow
def test_model_learns_color_captioning(tmp_path):
    json_path = make_learnable_dataset(str(tmp_path / "ds"), n_train=96,
                                       n_val=16, n_test=16, image_size=32)
    cfg = SATConfig(
        json=json_path, batch=16, epochs=30, input_size=32,
        encoder_arch="shufflenet_v2_x0_5", encoder_dim=32,
        embed_dim=24, attention_dim=24, decoder_dim=48,
        decoder_tf="always", att_gamma=0.2, decoder_lr=3e-3, embedding_lr=1e-2,
        val_interval=30, val_beamk=2, val_max_len=10, deep_output=True,
        aug_scale=1.0, aug_hflip=0.0, aug_color_jitter=0.0, aug_noise_std=0.0,
        seed=3)
    trainer = Trainer(cfg, log_root=str(tmp_path / "logs"))
    first = trainer.validate()
    final = trainer.fit()
    assert final["bleu4"] > 0.5, (first, final)
    assert final["bleu4"] > first.get("bleu4", 0) + 0.3
    assert final["accuracy"] if "accuracy" in final else True
