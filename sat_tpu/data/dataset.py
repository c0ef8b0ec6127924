"""Runtime data pipeline: JSON-backed dataset, bucket sampler, batch loader.

Mirrors the reference L1 layer (reference: util.py:16-87 CocoCaptionDataset +
BucketSampler; train.py:244-259 DataLoader wiring) redesigned for TPU feeding:

* Host does JPEG decode + aspect-preserving resize + crop to a STATIC
  (input_size, input_size) uint8 array; all augmentation beyond cropping runs
  on-device as jitted XLA ops (data/transforms.py) — the BASELINE.json north
  star's host/device split.
* Batches are fixed-shape; a thread-pool prefetcher overlaps decode with
  device compute (replacing torch DataLoader workers, train.py:244-249).
* JPEG decode defaults to the native C++ pipeline (sat_tpu/native): an
  in-process thread pool doing libjpeg IDCT-scaled decode + PIL-matching
  resample + crop straight into the batch buffer — the TPU-native stand-in
  for the reference's forked PIL DataLoader workers. PIL is the per-image
  fallback (non-JPEG files, corrupt images, missing toolchain).
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..vocab import Vocab


def pil_loader(path: str) -> Image.Image:
    """RGB-converting loader (reference: util.py:137-138)."""
    return Image.open(open(path, "rb")).convert("RGB")


def decode_resized(path: str, size: int) -> np.ndarray:
    """Decode -> resize shorter side to `size` -> uint8 HWC (full aspect)."""
    img = pil_loader(path)
    w, h = img.size
    scale = size / min(w, h)
    nw, nh = max(size, round(w * scale)), max(size, round(h * scale))
    return np.asarray(img.resize((nw, nh), Image.BILINEAR), np.uint8)


def square_crop(arr: np.ndarray, size: int, random_offset: bool = False,
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Square crop of a shorter-side=size array.

    Val: center crop (reference: train.py:208-212 Resize+CenterCrop).
    Train: a random square position along the longer side, preserving the
    translation diversity of torchvision's full-image RandomResizedCrop; the
    scale/aspect jitter then happens on-device."""
    nh, nw = arr.shape[:2]
    if random_offset and rng is not None:
        left = int(rng.integers(0, nw - size + 1))
        top = int(rng.integers(0, nh - size + 1))
    else:
        left, top = (nw - size) // 2, (nh - size) // 2
    return arr[top:top + size, left:left + size]


def load_resized_square(path: str, size: int, random_offset: bool = False,
                        rng: Optional[np.random.Generator] = None) -> np.ndarray:
    return square_crop(decode_resized(path, size), size, random_offset, rng)


class CaptionDataset:
    """One split of the preprocessed JSON (reference: util.py:16-45)."""

    def __init__(self, jsonpath_or_dict, split: str = "train"):
        self.json = (json.load(open(jsonpath_or_dict))
                     if isinstance(jsonpath_or_dict, str) else jsonpath_or_dict)
        self.split = split
        self.vocab = Vocab(self.json["vocab_stoi"])
        sd = self.json[split]
        self.img_paths: List[str] = sd["img_paths"]
        self.encoded_captions = np.asarray(sd["encoded_captions"], np.int32)
        self.lengths = np.asarray(sd["lengths"], np.int32)
        assert len(self.img_paths) == len(self.encoded_captions) == len(self.lengths)

    def __len__(self) -> int:
        return len(self.img_paths)

    @property
    def max_cap_length(self) -> int:
        return int(self.json["max_cap_length"])

    @property
    def num_refs(self) -> int:
        return self.encoded_captions.shape[1]


class BucketSampler:
    """TF-style bucket-by-total-target-length sampler (reference: util.py:48-87).

    Groups indices by the SUM of per-image caption lengths, emits longest
    groups first (fail-fast on OOM, util.py:64-66), shuffles within
    equal-length groups each epoch (util.py:77-84)."""

    def __init__(self, lengths: np.ndarray, batch_size: int,
                 indices: Optional[Sequence[int]] = None, seed: int = 0):
        self.batch_size = batch_size
        idxs = list(indices) if indices is not None else list(range(len(lengths)))
        totals = np.asarray(lengths).sum(axis=1)
        groups: Dict[int, List[int]] = {}
        for i in idxs:
            groups.setdefault(int(totals[i]), []).append(i)
        self.grouped = [groups[k] for k in sorted(groups, reverse=True)]
        self._seed = seed
        self._epoch = 0  # set_epoch makes shuffles a pure fn of (seed, epoch)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self._seed, 11, self._epoch]))
        out: List[int] = []
        for g in self.grouped:
            g = list(g)  # shuffle a COPY: order stays a pure fn of
            rng.shuffle(g)  # (seed, epoch), independent of shuffle history
            out.extend(g)
        self._epoch += 1  # stateless fallback when set_epoch isn't driven
        return iter(out)

    def __len__(self) -> int:
        return sum(len(g) for g in self.grouped)


class CaptionLoader:
    """Fixed-shape batch iterator with threaded decode prefetch.

    Yields dicts: images (B,S,S,3) uint8, captions (B,R,T) int32,
    lengths (B,R) int32. Drops the trailing partial batch (static shapes)."""

    def __init__(self, ds: CaptionDataset, batch_size: int, input_size: int,
                 shuffle: bool = True, bucket: bool = False, seed: int = 0,
                 workers: int = 0, train: bool = True, drop_last: bool = True,
                 trim_captions: Optional[bool] = None,
                 cache_images: bool = False,
                 native_decode: Optional[bool] = None,
                 process_index: int = 0, process_count: int = 1):
        self.ds = ds
        self.batch_size = batch_size
        # Multi-host (DCN): batch_size stays GLOBAL; every process computes
        # the identical epoch order (same seed) and materializes only its own
        # contiguous rows of each batch — mesh.shard_batch assembles the
        # global array via make_array_from_process_local_data.  Requires
        # drop_last (a ragged tail would disagree across hosts).
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            assert batch_size % process_count == 0, \
                f"batch {batch_size} not divisible by {process_count} processes"
            assert drop_last, "multi-host loading requires drop_last"
        self.input_size = input_size
        self.shuffle = shuffle
        self.bucket = bucket
        self.workers = max(0, workers)
        self.train = train
        self.drop_last = drop_last
        # The TPU-native payoff of bucketing: same-length batches let the
        # caption tensor trim to the batch max (fewer scan steps), with the
        # trimmed length rounded up to a multiple of 4 so XLA compiles at
        # most ceil(T/4) shapes (SURVEY.md §5 recompilation control).
        self.trim_captions = bucket if trim_captions is None else trim_captions
        # Optional decoded-image RAM cache (pre-crop, so the per-epoch random
        # offsets stay live). For subset-scale datasets this removes the
        # 1-core JPEG decode bottleneck after the first epoch.
        self._img_cache: Optional[Dict[int, np.ndarray]] = (
            {} if cache_images else None)
        # Native C++ decode pool (None -> auto-detect; see module docstring).
        self._native = None
        if native_decode is not False:
            from .. import native as _native_mod
            self._native = _native_mod.shared_pool()
            if self._native is None and native_decode is True:
                raise RuntimeError("native_decode=True but the C++ jpeg "
                                   "pipeline failed to build/load")
        # Per-epoch STATELESS rng streams (derived in __iter__): the epoch
        # permutation is a pure function of (seed, epoch) — identical on every
        # host regardless of augmentation draw counts (a PIL-fallback crop for
        # a corrupt image must not desynchronize hosts), and identical whether
        # the run reached epoch E directly or through a checkpoint resume
        # (bit-exact resume).  Crop/augment draws get their own
        # (seed, process, epoch) stream.
        self._seed = seed
        # placeholders only — __iter__ rebinds both from per-epoch
        # SeedSequence streams before any draw
        self._shuffle_rng = np.random.default_rng(seed)
        self._rng = np.random.default_rng(seed)
        self._sampler = (BucketSampler(ds.lengths, batch_size, seed=seed)
                         if bucket else None)
        self._epoch = 0
        self._external_epoch: Optional[int] = None
        self._skip_next = 0  # one-shot mid-epoch-resume offset (set_epoch)

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        """Drive the per-epoch rng streams explicitly (Trainer does this with
        the global epoch index so resumed runs replay the exact data order).

        skip_batches > 0 (mid-epoch resume) drops the first N batches of the
        epoch BEFORE any image is decoded — already-trained batches cost
        nothing on resume (ADVICE r1, low).  Crop randomness stays bit-exact
        because the crop rng is derived per batch from the GLOBAL batch
        index, not consumed sequentially across the epoch."""
        self._external_epoch = epoch
        self._skip_next = skip_batches

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> List[int]:
        if self._sampler is not None:
            return list(iter(self._sampler))
        order = list(range(len(self.ds)))
        if self.shuffle:
            self._shuffle_rng.shuffle(order)
        return order

    def _decode_full(self, path: str) -> np.ndarray:
        """Aspect-kept shorter-side resize (native fast path, PIL fallback)."""
        if self._native is not None:
            arr = self._native.decode_resized(path, self.input_size)
            if arr is not None:
                return arr
        return decode_resized(path, self.input_size)

    def _load_one(self, idx: int) -> np.ndarray:
        if self._img_cache is not None:
            arr = self._img_cache.get(idx)
            if arr is None:
                arr = self._decode_full(self.ds.img_paths[idx])
                self._img_cache[idx] = arr
            return square_crop(arr, self.input_size,
                               random_offset=self.train, rng=self._rng)
        return square_crop(self._decode_full(self.ds.img_paths[idx]),
                           self.input_size, random_offset=self.train,
                           rng=self._rng)

    def _load_images(self, idxs: Sequence[int]) -> np.ndarray:
        """Decode a whole batch: one native thread-pool call (GIL released),
        PIL per-image fallback for anything the native path rejects."""
        if self._native is None or self._img_cache is not None:
            return np.stack([self._load_one(i) for i in idxs])
        paths = [self.ds.img_paths[i] for i in idxs]
        # train: uniform over the inclusive crop range; val: center (< 0 is
        # the native pipeline's center-crop sentinel, == (n-size)//2)
        offs = (self._rng.random((len(idxs), 2)).astype(np.float32)
                if self.train
                else np.full((len(idxs), 2), -1.0, np.float32))
        imgs, ok = self._native.decode_batch(paths, self.input_size, offs)
        for j in np.flatnonzero(~ok):
            imgs[j] = square_crop(
                decode_resized(paths[j], self.input_size), self.input_size,
                random_offset=self.train, rng=self._rng)
        return imgs

    def _trim_len(self, idxs: Sequence[int]) -> int:
        """<START> + longest target run, rounded up to a 4-bucket.  Computed
        from the GLOBAL batch indices so multi-host processes agree on T."""
        t_needed = int(self.ds.lengths[list(idxs)].max()) + 1
        return min(-(-t_needed // 4) * 4 + 1, self.ds.encoded_captions.shape[2])

    def _make_batch(self, idxs: Sequence[int], trim_to: Optional[int] = None,
                    stream: Optional[Tuple[int, int]] = None
                    ) -> Dict[str, np.ndarray]:
        if stream is not None:
            # crop rng is a pure fn of (seed, process, epoch, GLOBAL batch
            # index): mid-epoch resume can skip batches without decoding them
            # and still replay the remainder's crops bit-exactly
            epoch, bi = stream
            self._rng = np.random.default_rng(np.random.SeedSequence(
                [self._seed, 5, self.process_index, epoch, bi]))
        imgs = self._load_images(idxs)
        captions = self.ds.encoded_captions[list(idxs)]
        lengths = self.ds.lengths[list(idxs)]
        if self.trim_captions:
            captions = captions[:, :, :(trim_to if trim_to is not None
                                        else self._trim_len(idxs))]
        return {"images": imgs, "captions": captions, "lengths": lengths}

    def batch_plans(self) -> List[Tuple[List[int], Optional[int],
                                        Tuple[int, int]]]:
        """Consume one epoch's batching plan — (dataset indices, caption
        trim, crop-rng stream key) per batch — WITHOUT decoding any image.
        Exactly the plan __iter__ would execute (same sampler order, trim
        buckets, mid-epoch-resume skip, epoch advance): the device-resident
        feeder (train/loop.py) pairs these with HBM-staged pixels, so the
        two paths train on bit-identical batches."""
        epoch = (self._external_epoch if self._external_epoch is not None
                 else self._epoch)
        self._rng = np.random.default_rng(
            np.random.SeedSequence([self._seed, 5, self.process_index, epoch]))
        self._shuffle_rng = np.random.default_rng(
            np.random.SeedSequence([self._seed, 7, epoch]))
        if self._sampler is not None:
            self._sampler.set_epoch(epoch)
        order = self._order()
        n_full = len(order) // self.batch_size
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        if not self.drop_last and len(order) % self.batch_size:
            batches.append(order[n_full * self.batch_size:])
        if self.process_count > 1:
            # per-host rows of each global batch + the batch's global trim
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            batches = [(b[lo:lo + local], self._trim_len(b)) for b in batches]
        else:
            batches = [(b, None) for b in batches]
        # mid-epoch resume: drop already-trained batches BEFORE decoding
        # anything; the surviving batches keep their global index so their
        # crop rng streams are unchanged
        plans = [(bidx, trim, (epoch, bi))
                 for bi, (bidx, trim) in enumerate(batches)][self._skip_next:]
        self._skip_next = 0
        self._epoch += 1
        return plans

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self.batch_plans()
        if self.workers == 0:
            for bidx, trim, stream in batches:
                yield self._make_batch(bidx, trim, stream)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.workers * 2)
        stop = threading.Event()  # consumer may abandon the epoch early
        # (val_percent limits, early stopping): the producer must not stay
        # blocked on a full queue forever

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            for bidx, trim, stream in batches:
                if not _put(self._make_batch(bidx, trim, stream)):
                    return
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=1.0)
                except queue.Empty:
                    if not t.is_alive():  # producer died on an exception:
                        raise RuntimeError(  # surface it, don't hang
                            "prefetch producer thread died (see traceback "
                            "above)")
                    continue
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            t.join(timeout=10)
