"""Checkpoint-resume test: training continues from the saved step/epoch with
restored optimizer state (reference: save_last=True resume path)."""

import os

import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


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


def test_resume_restores_scheduler_state(tmp_path):
    """The LR trajectory must continue, not reset (regression: a resumed
    MultiStepLR jumped back to the base LR past its milestones)."""
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8, n_val=8,
                                       image_size=32, max_cap_length=6)
    cfg = SATConfig(json=json_path, batch=8, epochs=4, input_size=32,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                    embed_dim=8, attention_dim=8, decoder_dim=16,
                    scheduler="step", milestones=(1, 2), lr_gamma=0.1,
                    decoder_tf="always", val_interval=100, seed=0,
                    aug_scale=1.0, aug_hflip=0.0, aug_noise_std=0.0)
    t1 = Trainer(cfg, log_root=str(tmp_path / "l1"))
    for e in range(3):
        t1.current_epoch = e
        t1.train_epoch()
    # after epochs 1 and 2 milestones: factor = 0.01
    lr_before = t1.scheduler.current_lrs(t1.global_step)["decoder"]
    assert abs(lr_before - 1e-3 * 0.01) < 1e-12
    from sat_tpu.train.checkpoints import save_checkpoint
    import os
    ckpt = os.path.join(str(tmp_path), "mid.ckpt")
    save_checkpoint(ckpt, t1.cfg, t1._checkpoint_tree())

    t2 = Trainer(cfg.replace(resume=ckpt), log_root=str(tmp_path / "l2"))
    lr_resumed = t2.scheduler.current_lrs(t2.global_step)["decoder"]
    assert abs(lr_resumed - lr_before) < 1e-12


def test_resume_from_restart_checkpoint_is_bit_exact(tmp_path):
    """Resume from a checkpoint WRITTEN BY RestartCheckpointManager (not one
    hand-saved by the test) and land bitwise on the uninterrupted run.

    Regression (ADVICE r1, high): the restart snapshot used to store the
    pre-increment step while params already included that step's update, so
    resume replayed the batch and double-applied its gradient."""
    import glob
    import numpy as np
    import jax
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    # spe=2, 4 epochs -> 8 steps; cosine t0-adjust gives t_i=3: LR rises
    # (warm restart) mid-run, triggering real restart-{step}.ckpt saves
    cfg = SATConfig(json=json_path, batch=8, epochs=4, input_size=32,
                    encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                    embed_dim=8, attention_dim=8, decoder_dim=16,
                    decoder_tf="linear", decoder_tf_min=0.3, val_interval=100,
                    seed=5, aug_scale=0.8, aug_hflip=0.5, aug_noise_std=0.01,
                    scheduler="cosine", cosine_iterations=2,
                    lr_warmup_steps=0)

    straight = Trainer(cfg, log_root=str(tmp_path / "l_straight"))
    straight.fit()
    restarts = sorted(glob.glob(os.path.join(straight.logdir,
                                             "restart-*.ckpt")))
    assert restarts, "cosine warm restart never saved a restart checkpoint"
    ckpt = restarts[0]
    # the stored step must be the post-update step (next-to-run), and the
    # file name must agree with it
    from sat_tpu.train.checkpoints import load_checkpoint
    _, raw = load_checkpoint(ckpt)
    step_in_file = int(raw["step"])
    assert ckpt.endswith(f"restart-{step_in_file}.ckpt")
    assert 0 < step_in_file < straight.global_step

    resumed = Trainer(cfg.replace(resume=ckpt),
                      log_root=str(tmp_path / "l_resumed"))
    assert resumed.global_step == step_in_file
    resumed.fit()
    assert resumed.global_step == straight.global_step
    a = jax.device_get(straight.variables["params"])
    b = jax.device_get(resumed.variables["params"])
    for pa, pb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.parametrize("bucket,workers,mid_epoch", [
    (False, 0, False),   # plain shuffle, epoch-boundary interrupt
    (True, 2, False),    # bucket sampler + threaded prefetch
    (False, 0, True),    # killed MID-epoch (restart-{step}.ckpt semantics)
])
def test_resume_is_bit_exact(tmp_path, bucket, workers, mid_epoch):
    """Interrupted-and-resumed training must equal uninterrupted training
    BITWISE: data order, host crop augs, device augs, scheduled-sampling
    coins, and optimizer updates are all pure functions of
    (seed, epoch, global_step) — including with the bucket sampler, threaded
    prefetch, and mid-epoch checkpoints (same epoch re-entered, already-
    trained batches skipped)."""
    import numpy as np
    import jax
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    base = SATConfig(json=json_path, batch=8, epochs=3, input_size=32,
                     encoder_arch="shufflenet_v2_x0_5", encoder_dim=16,
                     embed_dim=8, attention_dim=8, decoder_dim=16,
                     decoder_tf="linear", decoder_tf_min=0.3, val_interval=100,
                     seed=3, aug_scale=0.8, aug_hflip=0.5, aug_noise_std=0.01,
                     scheduler="cosine", cosine_iterations=2,
                     lr_warmup_steps=2, bucket_sampler=bucket, workers=workers)

    straight = Trainer(base, log_root=str(tmp_path / "l_straight"))
    straight.fit()

    # emulate a real interruption: same 3-epoch config (the TF-epsilon
    # schedule depends on total epochs)
    half = Trainer(base, log_root=str(tmp_path / "l_half"))
    half.current_epoch = 0
    half.train_epoch()
    if mid_epoch:
        half.current_epoch = 1
        half.train_epoch(max_batches=1)  # killed partway through epoch 1
    else:
        half.current_epoch = 1
        half.train_epoch()
    from sat_tpu.train.checkpoints import save_checkpoint
    ckpt = os.path.join(str(tmp_path), "interrupt.ckpt")
    save_checkpoint(ckpt, half.cfg, half._checkpoint_tree())
    resumed = Trainer(base.replace(resume=ckpt),
                      log_root=str(tmp_path / "l_resumed"))
    if mid_epoch:
        assert resumed.current_epoch == 1 and resumed._resume_skip_batches == 1
    resumed.fit()

    assert resumed.global_step == straight.global_step
    a = jax.device_get(straight.variables["params"])
    b = jax.device_get(resumed.variables["params"])
    for pa, pb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_top_k_registry_survives_resume(tmp_path):
    """save_top_k enforcement must persist across resume: the registry rides
    in every checkpoint (Lightning persists best_k_models the same way).
    Without it a worse post-resume metric is saved as 'top-k' and the
    historical best can never be evicted."""
    import numpy as np
    from sat_tpu.train.checkpoints import (TopKCheckpointManager,
                                           load_checkpoint, save_checkpoint)
    cfg = SATConfig(vocab_size=8, vocab_stoi={"<PAD>": 0, "<UNK>": 5,
                                              "<START>": 6, "<END>": 7})
    tree = {"params": {"w": np.zeros(2, np.float32)}, "state": {},
            "step": 3, "epoch": 1}

    d1 = str(tmp_path / "run1")
    m1 = TopKCheckpointManager(d1, monitor="bleu4", save_top_k=1)
    m1.on_validation_end(cfg, lambda: dict(tree), {"bleu4": 0.30}, 1, 3)
    best_path = m1.best[0][1]
    assert os.path.exists(best_path)
    _, raw = load_checkpoint(os.path.join(d1, "last.ckpt"))
    assert raw["top_k"], "registry missing from last.ckpt"
    # the top-k file itself also carries a registry including itself
    _, raw_best = load_checkpoint(best_path)
    assert any(abs(float(e["value"]) - 0.30) < 1e-9
               for e in raw_best["top_k"].values())

    # 'resume': fresh manager in a NEW version dir, registry restored
    d2 = str(tmp_path / "run2")
    m2 = TopKCheckpointManager(d2, monitor="bleu4", save_top_k=1)
    m2.load_state_dict(raw["top_k"], d1)
    assert m2.best_value == pytest.approx(0.30)

    # a worse value must NOT become a new 'top-1'
    m2.on_validation_end(cfg, lambda: dict(tree), {"bleu4": 0.22}, 2, 6)
    assert [f for f in os.listdir(d2) if f != "last.ckpt"] == []
    assert os.path.exists(best_path)

    # a better value evicts the pre-resume best (cross-directory)
    m2.on_validation_end(cfg, lambda: dict(tree), {"bleu4": 0.35}, 3, 9)
    assert not os.path.exists(best_path)
    newfiles = [f for f in os.listdir(d2) if f != "last.ckpt"]
    assert len(newfiles) == 1 and "0.3500" in newfiles[0]
