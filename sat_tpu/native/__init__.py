"""Native (C++) host-side image pipeline, loaded via ctypes.

The reference's data layer leans on native code implicitly -- PIL(-SIMD) JPEG
decode inside forked DataLoader worker processes (reference: util.py:41,
train.py:244-249).  SAT-TPU's equivalent is an in-process C++ thread pool
(jpeg_pipeline.cpp): libjpeg decode with IDCT scaling (PNG via libpng,
sniffed from magic bytes), PIL-matching bilinear resample, and square crop,
fused per image, writing straight into one contiguous batch buffer.  The
ctypes call releases the GIL, so Python-thread prefetch
(dataset.CaptionLoader workers) overlaps with device compute.

Builds lazily with g++ on first use; everything degrades gracefully to the
PIL path if the toolchain or libjpeg is missing (`available()` -> False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_pipeline.cpp")
_LIB = os.path.join(_DIR, "_jpeg_pipeline.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", _LIB, _SRC, "-ljpeg", "-lpng", "-lpthread"]
    # -march=native first; fall back to the portable build on ANY failure
    # (non-zero exit, missing g++, or timeout on a slow host)
    for cmd in (base[:2] + ["-march=native"] + base[2:], base):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=180)
        except (OSError, subprocess.TimeoutExpired):
            continue
        if proc.returncode == 0:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.satn_pool_create.restype = ctypes.c_void_p
        lib.satn_pool_create.argtypes = [ctypes.c_int]
        lib.satn_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.satn_decode_batch.restype = None
        lib.satn_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte)]
        lib.satn_decode_resized.restype = ctypes.c_long
        lib.satn_decode_resized.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.satn_corpus_stats.restype = None
        lib.satn_corpus_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_long)]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native library is built (or buildable) and loadable."""
    return _load() is not None


class DecodePool:
    """Persistent C++ decode thread pool.

    decode_batch(paths, size, offsets, fast_dct) -> (images, ok):
    images (N, size, size, 3) uint8, ok (N,) bool -- failed entries (non-JPEG,
    corrupt, missing) are left zeroed for the caller's PIL fallback.
    """

    def __init__(self, n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native jpeg pipeline unavailable")
        self._lib = lib
        n = n_threads or min(16, os.cpu_count() or 1)
        self._pool = lib.satn_pool_create(int(n))
        self.n_threads = int(n)

    def decode_batch(self, paths: Sequence[str], size: int,
                     offsets: np.ndarray, fast_dct: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        out = np.zeros((n, size, size, 3), np.uint8)
        ok = np.zeros(n, np.uint8)
        if n == 0:
            return out, ok.astype(bool)
        offs = np.ascontiguousarray(offsets, np.float32)
        assert offs.shape == (n, 2), offs.shape
        c_paths = (ctypes.c_char_p * n)(
            *[os.fsencode(p) for p in paths])
        self._lib.satn_decode_batch(
            self._pool, c_paths, n, int(size),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            1 if fast_dct else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        return out, ok.astype(bool)

    def decode_resized(self, path: str, size: int, fast_dct: bool = True
                       ) -> Optional[np.ndarray]:
        """Full aspect-kept resize (RAM-cache path); None on failure."""
        cap = size * size * 3 * 8
        for _ in range(2):
            buf = np.empty(cap, np.uint8)
            w = ctypes.c_int()
            h = ctypes.c_int()
            ret = self._lib.satn_decode_resized(
                os.fsencode(path), int(size), 1 if fast_dct else 0,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                int(cap), ctypes.byref(w), ctypes.byref(h))
            if ret == 0:
                return None
            if ret > 0:
                return buf[:ret].reshape(h.value, w.value, 3).copy()
            cap = -ret  # buffer too small: retry once with the exact size
        return None

    def corpus_stats(self, hyps: np.ndarray, hyp_lens: np.ndarray,
                     refs: np.ndarray, ref_lens: np.ndarray):
        """BLEU/GLEU corpus statistics (mirror of metrics._corpus_stats).

        hyps (B, HT) int32 padded; hyp_lens (B,); refs (B, R, T) int32 with
        runs refs[b, r, :ref_lens[b, r]] (caller strips <START>/<END>).
        Returns (num[0..4], den[0..4], hyp_len_total, ref_len_total,
        gleu_match, gleu_all) with num/den 1-indexed like the Python path."""
        hyps = np.ascontiguousarray(hyps, np.int32)
        hyp_lens = np.ascontiguousarray(hyp_lens, np.int32)
        refs = np.ascontiguousarray(refs, np.int32)
        ref_lens = np.ascontiguousarray(ref_lens, np.int32)
        b, ht = hyps.shape
        _, r, t = refs.shape
        out = np.zeros(12, np.int64)
        i32 = ctypes.POINTER(ctypes.c_int32)
        self._lib.satn_corpus_stats(
            self._pool, hyps.ctypes.data_as(i32), hyp_lens.ctypes.data_as(i32),
            b, ht, refs.ctypes.data_as(i32), ref_lens.ctypes.data_as(i32),
            r, t, out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        num = [0] + [int(x) for x in out[0:4]]
        den = [0] + [int(x) for x in out[4:8]]
        return (num, den, int(out[8]), int(out[9]), int(out[10]), int(out[11]))

    def close(self) -> None:
        if self._pool is not None:
            self._lib.satn_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover - interpreter-shutdown best effort
        try:
            self.close()
        except Exception:
            pass


_shared: Optional[DecodePool] = None
_shared_lock = threading.Lock()


def shared_pool() -> Optional[DecodePool]:
    """Process-wide pool (lazily created); None if native is unavailable."""
    global _shared
    if not available():
        return None
    with _shared_lock:  # two racing first callers must not each build a pool
        if _shared is None:
            _shared = DecodePool()
    return _shared
