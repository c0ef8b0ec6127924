"""Native C++ jpeg pipeline (sat_tpu/native) vs the PIL oracle.

The native path replaces the reference's implicit native data layer (PIL
decode in forked DataLoader workers, reference: util.py:41 + train.py:244-249)
with an in-process libjpeg thread pool.  These tests pin:
* resample parity with PIL's antialiased BILINEAR (the exact algorithm the
  reference's torchvision transforms bottom out in),
* center-crop offset parity with dataset.square_crop,
* the IDCT-scaled fast path staying visually equivalent,
* graceful per-image fallback (non-JPEG input) inside CaptionLoader.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sat_tpu import native
from sat_tpu.data.dataset import (CaptionDataset, CaptionLoader,
                                  decode_resized, square_crop)
from sat_tpu.data.preprocess import make_synthetic_dataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native jpeg pipeline not buildable")


@pytest.fixture(scope="module")
def pool():
    return native.DecodePool(2)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    """A few JPEGs with structure (gradients + blocks), varied sizes/aspects."""
    out = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (333, 500), (64, 200)]):
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([x * 255 // w, y * 255 // h, (x + y) * 255 // (w + h)],
                       -1).astype(np.uint8)
        img[h // 4:h // 2, w // 4:w // 2] = rng.integers(0, 255, 3)
        p = str(out / f"img_{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def test_resample_matches_pil(pool, jpegs):
    """Full-IDCT decode + our resample vs PIL decode + PIL BILINEAR resize:
    same pixels to within rounding (1 LSB)."""
    size = 224
    offs = np.full((len(jpegs), 2), -1.0, np.float32)
    out, ok = pool.decode_batch(jpegs, size, offs, fast_dct=False)
    assert ok.all()
    for i, p in enumerate(jpegs):
        ref = square_crop(decode_resized(p, size), size)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.max() <= 2 and diff.mean() < 0.5, (p, diff.max(), diff.mean())


def test_fast_dct_close(pool, jpegs):
    """IDCT scaling decodes at ~target resolution; small numeric drift only."""
    size = 128
    offs = np.full((len(jpegs), 2), -1.0, np.float32)
    out, ok = pool.decode_batch(jpegs, size, offs, fast_dct=True)
    assert ok.all()
    for i, p in enumerate(jpegs):
        ref = square_crop(decode_resized(p, size), size)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 2.0, (p, diff.mean())


def test_decode_resized_cache_path(pool, jpegs):
    """Aspect-kept resize (RAM-cache path) matches PIL dims and pixels."""
    for p in jpegs:
        arr = pool.decode_resized(p, 96, fast_dct=False)
        ref = decode_resized(p, 96)
        assert arr.shape == ref.shape
        assert np.abs(arr.astype(int) - ref.astype(int)).mean() < 0.5


def test_extreme_aspect_needs_buffer_regrow(pool, tmp_path):
    """Aspect > 8 exceeds the first-guess buffer; the retry path must cover it."""
    img = np.zeros((40, 800, 3), np.uint8)
    img[:, ::7] = 255
    p = str(tmp_path / "wide.jpg")
    Image.fromarray(img).save(p, quality=95)
    arr = pool.decode_resized(p, 64, fast_dct=False)
    ref = decode_resized(p, 64)
    assert arr is not None and arr.shape == ref.shape  # (64, 1280, 3)


def test_png_decodes_natively(pool, tmp_path):
    """PNGs are sniffed from magic bytes and decoded via libpng, matching PIL
    (incl. RGBA composited like .convert('RGB'))."""
    y, x = np.mgrid[0:64, 0:96]
    arr = np.stack([x * 2, y * 3, x + y], -1).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(arr).save(p)
    offs = np.full((1, 2), -1.0, np.float32)
    out, ok = pool.decode_batch([p], 32, offs)
    assert ok.all()
    ref = square_crop(decode_resized(p, 32), 32)
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 2


def test_failures_flagged_not_fatal(pool, tmp_path):
    txt = str(tmp_path / "not_an_image.jpg")
    with open(txt, "w") as f:
        f.write("plain text, wrong magic")
    offs = np.full((2, 2), -1.0, np.float32)
    out, ok = pool.decode_batch([txt, str(tmp_path / "missing.jpg")], 24, offs)
    assert not ok.any()
    assert (out == 0).all()


def test_loader_native_matches_pil_loader(tmp_path):
    """End-to-end: CaptionLoader with native decode == PIL loader on a mixed
    PNG dataset re-encoded as JPEG (val path: deterministic center crops)."""
    path = make_synthetic_dataset(str(tmp_path), n_train=8, n_val=4, n_test=4,
                                  image_size=48, max_cap_length=8)
    ds = CaptionDataset(path, "val")
    # convert half the images to JPEG so both decode paths are exercised;
    # use smooth gradients (the synthetic PNGs are uniform noise, the
    # pathological worst case for the IDCT-scaled fast path)
    y, x = np.mgrid[0:48, 0:48]
    grad = np.stack([x * 5, y * 5, x * 2 + y * 2], -1).astype(np.uint8)
    for i, p in enumerate(ds.img_paths):
        if i % 2 == 0:
            q = os.path.splitext(p)[0] + ".jpg"
            Image.fromarray(np.roll(grad, i, axis=0)).save(q, quality=95)
            ds.img_paths[i] = q
    a = list(CaptionLoader(ds, 4, 32, shuffle=False, train=False,
                           drop_last=False, native_decode=True))
    b = list(CaptionLoader(ds, 4, 32, shuffle=False, train=False,
                           drop_last=False, native_decode=False))
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0]["captions"], b[0]["captions"])
    diff = np.abs(a[0]["images"].astype(int) - b[0]["images"].astype(int))
    # JPEG halves: near-identical modulo IDCT rounding; PNG halves: lossless
    # decode + PIL-matching resample, within rounding of the PIL loader.
    assert diff.mean() < 2.0
    assert diff[1::2].max() <= 2


def test_loader_train_native_shapes(tmp_path):
    """Train path (random offsets) through the native pool: shapes + dtype."""
    path = make_synthetic_dataset(str(tmp_path), n_train=8, n_val=2, n_test=2,
                                  image_size=48, max_cap_length=8)
    ds = CaptionDataset(path, "train")
    for i, p in enumerate(ds.img_paths):
        q = os.path.splitext(p)[0] + ".jpg"
        Image.open(p).save(q, quality=95)
        ds.img_paths[i] = q
    loader = CaptionLoader(ds, 4, 32, shuffle=True, train=True, seed=3,
                           native_decode=True)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape == (4, 32, 32, 3)
        assert b["images"].dtype == np.uint8
        assert b["images"].any()
