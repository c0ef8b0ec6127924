"""Device-resident training data (VERDICT r3 #3): the whole train split is
staged in HBM once and each jitted step gathers its batch rows by index.

Pins: (1) the loss/accuracy trajectory and the post-epoch parameters are
IDENTICAL to the host-loader path on exact-size images (same bucket order,
caption trims, augmentation rng — the gather step reuses the literal
_train_step); (2) oversize images fall back to one center crop at staging
with a visible warning; (3) the epoch plan honors mid-epoch-resume batch
skipping without decoding anything."""

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
                decoder_tf="inv_sigmoid", bucket_sampler=True,
                val_interval=100, seed=3)
    base.update(kw)
    return SATConfig(**base)


@pytest.mark.parametrize("spd", [1, 3])
def test_device_resident_matches_host_path(tmp_path, spd):
    """spd=1 exercises the per-step gather path; spd=3 the chunked-scan
    path including a ragged tail chunk (4 plans -> chunks of 3 + 1)."""
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=32,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    host = Trainer(_cfg(json_path), log_root=str(tmp_path / "lh"))
    dev = Trainer(_cfg(json_path, device_resident_data=True,
                       steps_per_dispatch=spd),
                  log_root=str(tmp_path / "ld"))
    assert dev._staged_images is not None
    assert dev._staged_images.shape == (32, 32, 32, 3)

    m_host = host.train_epoch()
    m_dev = dev.train_epoch()
    assert host.global_step == dev.global_step == 4
    # identical batches + identical rng streams -> identical trajectory
    for k in m_host:
        assert m_host[k] == pytest.approx(m_dev[k], rel=1e-5, abs=1e-6), k
    # and identical parameters after the epoch
    ph = jax_tree_to_numpy(host.variables["params"])
    pd = jax_tree_to_numpy(dev.variables["params"])
    import jax
    for (kh, h), (kd, d) in zip(jax.tree_util.tree_leaves_with_path(ph),
                                jax.tree_util.tree_leaves_with_path(pd)):
        assert kh == kd
        np.testing.assert_allclose(h, d, rtol=1e-5, atol=1e-6,
                                   err_msg=str(kh))
    if spd == 3:
        # device-resident validation (staged val pixels + index gather,
        # incl. the padded tail batch) must score identically to the host
        # val loader
        v_host = host.validate()
        v_dev = dev.validate()
        for k in v_host:
            assert v_host[k] == pytest.approx(v_dev[k], rel=1e-5,
                                              abs=1e-6), k


def jax_tree_to_numpy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def test_chunk_cut_at_lr_increase_matches_per_step_restarts(tmp_path):
    """ADVICE r4: a cosine warm restart landing INSIDE a dispatch chunk must
    cut the chunk so the restart snapshot is taken at the per-step path's
    position (after exactly one increased-LR update), not up to
    steps_per_dispatch-1 updates later.  Pins: identical restart-{step}.ckpt
    filenames AND identical post-run params between spd=1 (per-step gather)
    and spd=8 (one chunk per epoch, restart mid-chunk)."""
    import glob
    import os
    import jax
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=64,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    # 8 steps/epoch; cosine_iterations=3 -> t0-adjust gives t_i=5: the LR
    # rises at step 5, strictly inside an 8-step chunk
    kw = dict(scheduler="cosine", cosine_iterations=3, lr_warmup_steps=0,
              device_resident_data=True)
    per_step = Trainer(_cfg(json_path, steps_per_dispatch=1, **kw),
                       log_root=str(tmp_path / "l1"))
    chunked = Trainer(_cfg(json_path, steps_per_dispatch=8, **kw),
                      log_root=str(tmp_path / "l8"))
    per_step.train_epoch()
    chunked.train_epoch()
    r1 = sorted(os.path.basename(p) for p in
                glob.glob(os.path.join(per_step.logdir, "restart-*.ckpt")))
    r8 = sorted(os.path.basename(p) for p in
                glob.glob(os.path.join(chunked.logdir, "restart-*.ckpt")))
    assert r1, "cosine warm restart never fired in the per-step run"
    assert r1 == r8
    a = jax.device_get(per_step.variables["params"])
    b = jax.device_get(chunked.variables["params"])
    for pa, pb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


def test_oversize_images_center_crop_with_warning(tmp_path, capsys):
    import json as _json
    from PIL import Image
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=8,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    # make the train images RECTANGULAR: the short-side resize then leaves
    # a (32, 64) array, forcing the staging-time center-crop fallback
    rng = np.random.default_rng(0)
    for p in _json.load(open(json_path))["train"]["img_paths"]:
        Image.fromarray(rng.integers(0, 256, (32, 64, 3), np.uint8)
                        .astype(np.uint8)).save(p)
    t = Trainer(_cfg(json_path, device_resident_data=True),
                log_root=str(tmp_path / "l"))
    assert t._staged_images.shape == (8, 32, 32, 3)
    out = capsys.readouterr().out
    assert "WARNING" in out and "center crop" in out
    t.train_epoch()  # and it trains


def test_batch_plans_honor_skip_without_decoding(tmp_path):
    """The device path's epoch plan (CaptionLoader.batch_plans) must match
    the host iterator's batching exactly, including mid-epoch-resume skip."""
    from sat_tpu.data.dataset import CaptionDataset, CaptionLoader
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16,
                                       n_val=8, image_size=32,
                                       max_cap_length=6)
    ds = CaptionDataset(json_path, "train")
    a = CaptionLoader(ds, 4, 32, bucket=True, seed=5)
    b = CaptionLoader(ds, 4, 32, bucket=True, seed=5)
    a.set_epoch(2)
    b.set_epoch(2, skip_batches=2)
    full = a.batch_plans()
    skipped = b.batch_plans()
    assert len(full) == 4 and len(skipped) == 2
    # the surviving plans keep their global batch index (crop-rng stream)
    assert [p[0] for p in skipped] == [p[0] for p in full[2:]]
    assert [p[2] for p in skipped] == [p[2] for p in full[2:]]
