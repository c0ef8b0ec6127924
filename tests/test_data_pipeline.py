"""Data pipeline tests: bucket sampler semantics (reference: util.py:48-87,
prototype dev/dev_bucket_sampler.py), loader shapes, device augmentations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.dataset import (BucketSampler, CaptionDataset, CaptionLoader,
                                  load_resized_square)
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.data.transforms import build_train_augment, val_preprocess


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    out = tmp_path_factory.mktemp("dp")
    path = make_synthetic_dataset(str(out), n_train=24, n_val=6, n_test=6,
                                  image_size=40, max_cap_length=10)
    return CaptionDataset(path, "train")


def test_bucket_sampler_longest_first_and_grouped():
    lengths = np.array([[3, 4], [9, 9], [3, 4], [9, 9], [5, 5], [5, 5]])
    s = BucketSampler(lengths, batch_size=2, seed=0)
    order = list(iter(s))
    totals = [int(lengths[i].sum()) for i in order]
    # groups emitted longest-total first (OOM fail-fast, util.py:64-66)
    assert totals == sorted(totals, reverse=True)
    assert len(order) == 6 and set(order) == set(range(6))
    # within-group shuffling varies across epochs but keeps group boundaries
    order2 = list(iter(s))
    totals2 = [int(lengths[i].sum()) for i in order2]
    assert totals2 == totals


def test_loader_shapes_and_determinism(ds):
    loader = CaptionLoader(ds, batch_size=8, input_size=32, shuffle=True,
                           seed=5, train=True)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (8, 32, 32, 3) and b["images"].dtype == np.uint8
    assert b["captions"].shape == (8, 5, 12)  # max_cap_length 10 + START/END
    assert b["lengths"].shape == (8, 5)


def test_loader_tail_batch_not_dropped(ds):
    """drop_last=False yields exactly one partial tail batch (regression:
    an empty extra batch used to crash np.stack and deadlock the prefetcher)."""
    loader = CaptionLoader(ds, batch_size=7, input_size=32, shuffle=False,
                           train=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == -(-len(ds) // 7) == len(loader)
    assert batches[-1]["images"].shape[0] == len(ds) % 7
    # threaded path too
    batches_t = list(CaptionLoader(ds, 7, 32, shuffle=False, train=False,
                                   drop_last=False, workers=2))
    assert len(batches_t) == len(batches)


def test_loader_bucket_mode(ds):
    loader = CaptionLoader(ds, batch_size=4, input_size=32, bucket=True,
                           shuffle=False, train=False)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    full_t = ds.encoded_captions.shape[2]
    for b in batches:
        t = b["captions"].shape[2]
        # trimmed to the batch's needed length, 4-bucketed, never larger
        assert t <= full_t and (t == full_t or t % 4 == 1)
        assert t >= int(b["lengths"].max()) + 1
        # END token still present at position `length` for every caption
        lens = b["lengths"]
        for i in range(lens.shape[0]):
            for j in range(lens.shape[1]):
                assert b["captions"][i, j, lens[i, j]] == ds.vocab.end_idx


def test_loader_threaded_prefetch_equivalence(ds):
    a = list(CaptionLoader(ds, 8, 32, shuffle=False, train=False, workers=0))
    b = list(CaptionLoader(ds, 8, 32, shuffle=False, train=False, workers=2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["captions"], y["captions"])
        np.testing.assert_array_equal(x["images"], y["images"])


def test_load_resized_square(ds):
    arr = load_resized_square(ds.img_paths[0], 24)
    assert arr.shape == (24, 24, 3) and arr.dtype == np.uint8


def test_augment_identity_when_disabled():
    cfg = SATConfig(input_size=16, aug_scale=1.0, aug_hflip=0.0,
                    aug_color_jitter=0.0, aug_optical_strength=0.0,
                    aug_noise_std=0.0)
    aug = build_train_augment(cfg)
    imgs = np.random.default_rng(0).integers(0, 256, (2, 16, 16, 3),
                                             dtype=np.uint8)
    out = np.array(aug(jax.random.PRNGKey(0), jnp.asarray(imgs)))
    np.testing.assert_allclose(out, imgs.astype(np.float32) / 255.0, atol=1e-6)


def test_augment_full_pipeline_shapes_and_range():
    cfg = SATConfig(input_size=24, aug_scale=0.8, aug_hflip=0.5,
                    aug_color_jitter=0.3, aug_optical_strength=0.4,
                    aug_noise_std=0.02)
    aug = jax.jit(build_train_augment(cfg))
    imgs = np.random.default_rng(1).integers(0, 256, (4, 24, 24, 3),
                                             dtype=np.uint8)
    out1 = np.array(aug(jax.random.PRNGKey(1), jnp.asarray(imgs)))
    out2 = np.array(aug(jax.random.PRNGKey(2), jnp.asarray(imgs)))
    assert out1.shape == imgs.shape
    assert np.isfinite(out1).all()
    assert not np.allclose(out1, out2)  # stochastic
    # ex-noise values stay near [0,1]
    assert out1.min() > -0.2 and out1.max() < 1.2


def test_hflip_is_exact_mirror():
    cfg = SATConfig(input_size=8, aug_scale=1.0, aug_hflip=0.999,
                    aug_color_jitter=0.0, aug_optical_strength=0.0,
                    aug_noise_std=0.0)
    aug = build_train_augment(cfg)
    imgs = np.zeros((1, 8, 8, 3), np.uint8)
    imgs[0, :, 0, :] = 255  # left column lit
    # hflip prob .999: overwhelmingly flipped
    for seed in range(5):
        out = np.array(aug(jax.random.PRNGKey(seed), jnp.asarray(imgs)))
        if out[0, 4, 7, 0] > 0.9 and out[0, 4, 0, 0] < 0.1:
            return
    raise AssertionError("hflip never produced a mirror")


def test_mxu_resample_matches_gather():
    """The matmul (MXU) formulation of separable bilinear resampling must
    reproduce the two-point gather formulation: exactly in fp32, within ~1
    uint8 LSB in bf16 (the train-step compute dtype)."""
    from sat_tpu.ops.image_ops import separable_resample, separable_resample_mxu
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((3, 17, 23, 3), np.float32))
    py = jnp.asarray(rng.uniform(-1.0, 17.5, (3, 9)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-1.0, 23.5, (3, 11)).astype(np.float32))
    ref = np.array(separable_resample(x, jnp.clip(py, 0, 16.0),
                                      jnp.clip(px, 0, 22.0)))
    got32 = np.array(separable_resample_mxu(x, py, px, jnp.float32))
    np.testing.assert_allclose(got32, ref, atol=1e-5)
    got16 = np.array(separable_resample_mxu(x, py, px, jnp.bfloat16))
    np.testing.assert_allclose(got16, ref, atol=1.5 / 255.0)


def test_crop_flip_fold_matches_post_reverse():
    """Folding hflip into the resample's column coordinates must equal
    resampling then mirroring (what the separate reverse used to do)."""
    from sat_tpu.ops.image_ops import separable_resample_mxu
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
    py = jnp.broadcast_to(jnp.linspace(1.0, 10.0, 12), (2, 12))
    px = jnp.broadcast_to(jnp.linspace(0.5, 10.5, 12), (2, 12))
    a = np.array(separable_resample_mxu(x, py, px[:, ::-1], jnp.float32))
    b = np.array(separable_resample_mxu(x, py, px, jnp.float32))[:, :, ::-1, :]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fast_rng_noise_deterministic_and_fallback():
    """cfg.fast_rng routes the image-noise draw through the hardware
    RngBitGenerator: same key -> same noise (determinism / bit-exact resume
    holds), different key -> different noise; fast_rng=False reproduces the
    plain-threefry draw exactly."""
    imgs = np.random.default_rng(2).integers(0, 256, (2, 8, 8, 3),
                                             dtype=np.uint8)
    base = dict(input_size=8, aug_scale=1.0, aug_hflip=0.0,
                aug_color_jitter=0.0, aug_optical_strength=0.0,
                aug_noise_std=0.05)
    fast = build_train_augment(SATConfig(**base, fast_rng=True))
    slow = build_train_augment(SATConfig(**base, fast_rng=False))
    a1 = np.array(fast(jax.random.PRNGKey(7), jnp.asarray(imgs)))
    a2 = np.array(fast(jax.random.PRNGKey(7), jnp.asarray(imgs)))
    b1 = np.array(fast(jax.random.PRNGKey(8), jnp.asarray(imgs)))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b1)
    # threefry fallback == the historical draw
    s1 = np.array(slow(jax.random.PRNGKey(7), jnp.asarray(imgs)))
    (_, _, _, _, _, _, _, _, r_noise) = jax.random.split(
        jax.random.PRNGKey(7), 9)
    want = imgs.astype(np.float32) / 255.0 + np.array(
        jax.random.normal(r_noise, imgs.shape, jnp.float32)) * 0.05
    np.testing.assert_allclose(s1, want, atol=1e-6)


def test_val_preprocess():
    imgs = np.full((2, 4, 4, 3), 255, np.uint8)
    out = np.array(val_preprocess(jnp.asarray(imgs)))
    np.testing.assert_allclose(out, 1.0)


def test_cache_images_val_identical_and_skips_decode(tmp_path):
    """cache_images (config flag, used by the subset-scale soaks): val-mode
    batches are identical to the uncached loader, and epochs 2+ never touch
    the source files (proved by deleting them after epoch 1)."""
    import shutil
    from sat_tpu.data.preprocess import make_synthetic_dataset
    path = make_synthetic_dataset(str(tmp_path), n_train=12, n_val=4,
                                  n_test=4, image_size=40, max_cap_length=10)
    ds2 = CaptionDataset(path, "train")
    plain = list(CaptionLoader(ds2, 4, 32, shuffle=False, train=False))
    cached_loader = CaptionLoader(ds2, 4, 32, shuffle=False, train=False,
                                  cache_images=True)
    cached = list(cached_loader)
    for x, y in zip(plain, cached):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["captions"], y["captions"])
    shutil.rmtree(tmp_path / "imgs")  # epoch 2 must be served from RAM
    cached2 = list(cached_loader)
    for x, y in zip(cached, cached2):
        np.testing.assert_array_equal(x["images"], y["images"])


def test_cache_images_train_crops_deterministic_and_varying(tmp_path):
    """Train-mode random crops through the cache stay a pure function of
    (seed, epoch, batch index) — identical across fresh loaders — and
    still vary across epochs (the cache stores PRE-crop arrays)."""
    from PIL import Image
    from sat_tpu.data.preprocess import make_synthetic_dataset
    path = make_synthetic_dataset(str(tmp_path), n_train=8, n_val=4,
                                  n_test=4, image_size=40, max_cap_length=10)
    ds2 = CaptionDataset(path, "train")
    # rectangular sources so the random crop has a live offset range
    # (square 40px images resize to exactly 32x32 — zero crop freedom)
    r = np.random.default_rng(0)
    for p in ds2.img_paths:
        Image.fromarray(r.integers(0, 256, (40, 64, 3), dtype=np.uint8)
                        ).save(p)
    mk = lambda: CaptionLoader(ds2, 8, 32, shuffle=False, train=True,
                               seed=3, cache_images=True)
    la, lb = mk(), mk()
    la.set_epoch(0)
    lb.set_epoch(0)
    e0a, e0b = list(la), list(lb)
    for x, y in zip(e0a, e0b):
        np.testing.assert_array_equal(x["images"], y["images"])
    la.set_epoch(1)
    e1 = list(la)
    assert any(not np.array_equal(x["images"], y["images"])
               for x, y in zip(e0a, e1))
