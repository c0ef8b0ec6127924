"""Checkpoint-resume test: training continues from the saved step/epoch with
restored optimizer state (reference: save_last=True resume path)."""

import os

import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.train.loop import Trainer


def test_resume_continues_from_checkpoint(tmp_path):
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8, n_val=8,
                                       image_size=32, max_cap_length=6)
    cfg = SATConfig(json=json_path, batch=8, epochs=2, input_size=32,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                    embed_dim=8, attention_dim=8, decoder_dim=16,
                    decoder_tf="always", val_interval=2, val_beamk=2,
                    val_max_len=4, seed=0, aug_scale=1.0, aug_hflip=0.0,
                    aug_noise_std=0.0)
    t1 = Trainer(cfg, log_root=str(tmp_path / "logs"))
    t1.fit()
    steps_done = t1.global_step
    ckpt = os.path.join(t1.logdir, "last.ckpt")
    assert os.path.exists(ckpt)

    cfg2 = cfg.replace(resume=ckpt, epochs=3)
    t2 = Trainer(cfg2, log_root=str(tmp_path / "logs2"))
    assert t2.global_step == steps_done
    assert t2.current_epoch == 2
    t2.fit()
    assert t2.global_step == steps_done + len(t2.train_loader)  # one more epoch
