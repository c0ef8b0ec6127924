"""Standalone image helpers (reference: util.py:133-164)."""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
from PIL import Image


def json_loader(path: str):
    return json.load(open(path))


def pil_loader(path: str) -> Image.Image:
    return Image.open(open(path, "rb")).convert("RGB")


def crop_center(pil_img: Image.Image, crop_width: int, crop_height: int) -> Image.Image:
    w, h = pil_img.size
    return pil_img.crop(((w - crop_width) // 2, (h - crop_height) // 2,
                         (w + crop_width) // 2, (h + crop_height) // 2))


def crop_max_square(pil_img: Image.Image, size: Optional[int]) -> Image.Image:
    pil_img = crop_center(pil_img, min(pil_img.size), min(pil_img.size))
    if size:
        pil_img = pil_img.resize((size, size))
    return pil_img


def load_square(path: str, size: Optional[int] = None) -> Image.Image:
    return crop_max_square(pil_loader(path), size)


def prepare_image(img: Image.Image, size: Optional[int] = None) -> np.ndarray:
    """PIL image -> (1, H, W, 3) float32 [0,1] array ready for the encoder
    (NHWC, the TPU-native layout; the reference returns NCHW torch tensors)."""
    if size:
        img = crop_max_square(img, int(size))
    return np.asarray(img, np.float32)[None] / 255.0


def time_to_string(t: float) -> str:
    """(reference: util.py:115-118)"""
    if t > 3600:
        return f"{t/3600:.2f} hours"
    if t > 60:
        return f"{t/60:.2f} minutes"
    return f"{t:.2f} seconds"
