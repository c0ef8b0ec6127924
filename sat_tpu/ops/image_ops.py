"""On-device image ops: the XLA-native replacement for torchvision transforms.

The reference runs PIL/torchvision transforms on CPU workers (reference:
train.py:208-233) and normalizes inside the model (model.py:59).  Here the
geometric ops are expressed as static-shape XLA programs: every geometric
augmentation (random-resized-crop, perspective, affine, rotation, hflip) is a
single bilinear grid-sample with a per-sample affine/homography matrix, so one
fused gather+lerp kernel covers the whole family with no dynamic shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# All image tensors here are NHWC float32 in [0, 1].


def normalize_image(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Channel-wise (x - mean) / std (reference: model.py:59 Normalize as first layer)."""
    mean = jnp.asarray(mean, x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    std = jnp.asarray(std, x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return (x - mean) / std


def bilinear_resize(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers == torch Upsample(align_corners=False)
    (reference: readme.md:121 Upsample mode=bilinear)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


def adaptive_avg_pool2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d semantics on NHWC via an integral image.

    Bin i covers rows [floor(i*H/oh), ceil((i+1)*H/oh)) — exact torch parity for
    non-divisible sizes (reference: readme.md:119 AdaptiveAvgPool2d; prototype
    dev/dev_adaptive_avg.py:18-26).  Indices are static, so XLA sees plain gathers.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:  # fast path: uniform window -> reshape-mean
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    acc = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=1), axis=2)
    acc = jnp.pad(acc, ((0, 0), (1, 0), (1, 0), (0, 0)))
    rs = [int(i * h // oh) for i in range(oh)]
    re = [int(-(-((i + 1) * h) // oh)) for i in range(oh)]
    cs = [int(j * w // ow) for j in range(ow)]
    ce = [int(-(-((j + 1) * w) // ow)) for j in range(ow)]
    rs_a, re_a = jnp.array(rs), jnp.array(re)
    cs_a, ce_a = jnp.array(cs), jnp.array(ce)
    # Box sums via the 4-corner trick on the integral image
    a = acc[:, re_a][:, :, ce_a]
    b_ = acc[:, rs_a][:, :, ce_a]
    c_ = acc[:, re_a][:, :, cs_a]
    d = acc[:, rs_a][:, :, cs_a]
    area = ((re_a - rs_a)[:, None] * (ce_a - cs_a)[None, :]).astype(jnp.float32)
    out = (a - b_ - c_ + d) / area[None, :, :, None]
    return out.astype(x.dtype)


def center_crop(x: jax.Array, size: int) -> jax.Array:
    """Static center crop to (size, size)."""
    _, h, w, _ = x.shape
    top, left = (h - size) // 2, (w - size) // 2
    return x[:, top:top + size, left:left + size, :]


# ---------------------------------------------------------------------------
# Grid sampling: the core of every geometric augmentation
# ---------------------------------------------------------------------------

def grid_sample_bilinear(x: jax.Array, grid_y: jax.Array, grid_x: jax.Array,
                         fill: float = 0.0) -> jax.Array:
    """Sample x (B,H,W,C) at float pixel coords grid_y/grid_x (B,OH,OW).

    Out-of-bounds samples return ``fill`` (zeros by default, like torchvision)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(grid_y)
    x0 = jnp.floor(grid_x)
    wy = (grid_y - y0)[..., None]
    wx = (grid_x - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yc, xc)  # (B,OH,OW,C)
        return jnp.where(valid[..., None], vals, fill)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def separable_resample(x: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Axis-aligned bilinear resampling: sample rows at py (B, OH) then columns
    at px (B, OW).  Equivalent to grid_sample with an axis-aligned grid but
    uses contiguous take_along_axis row/column gathers instead of per-pixel
    point gathers — orders of magnitude faster on TPU (the default
    RandomResizedCrop+flip path has no rotation, so it is always separable).
    Coordinates are clamped to the image (crops stay in-bounds)."""
    b, h, w, c = x.shape
    py = jnp.clip(py, 0.0, h - 1.0)
    px = jnp.clip(px, 0.0, w - 1.0)
    y0 = jnp.floor(py)
    wy = (py - y0)[:, :, None, None]
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    rows0 = jnp.take_along_axis(x, y0i[:, :, None, None], axis=1)
    rows1 = jnp.take_along_axis(x, y1i[:, :, None, None], axis=1)
    rows = rows0 * (1 - wy) + rows1 * wy          # (B, OH, W, C)

    x0 = jnp.floor(px)
    wx = (px - x0)[:, None, :, None]
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    cols0 = jnp.take_along_axis(rows, x0i[:, None, :, None], axis=2)
    cols1 = jnp.take_along_axis(rows, x1i[:, None, :, None], axis=2)
    return cols0 * (1 - wx) + cols1 * wx          # (B, OH, OW, C)


def _bilinear_weight_matrix(p: jax.Array, n: int, dtype) -> jax.Array:
    """(B, O) float coords -> (B, O, n) bilinear interpolation matrix.

    W[b, o, i] = relu(1 - |p[b,o] - i|): the bilinear hat function — exactly
    the (1-w)/w pair a two-point gather would use, rows sum to 1 for p inside
    [0, n-1] (coords are clamped by the caller)."""
    idx = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p[:, :, None] - idx[None, None, :]))
    return w.astype(dtype)


def separable_resample_mxu(x: jax.Array, py: jax.Array, px: jax.Array,
                           compute_dtype=jnp.bfloat16) -> jax.Array:
    """Axis-aligned bilinear resampling as two batched matmuls on the MXU.

    Same math as ``separable_resample`` but expressed as dense interpolation
    matrices contracted over rows then columns — on TPU this replaces four
    full-image gather passes (plus the layout copies XLA inserts around them)
    with systolic-array matmuls.  At the flagship train shape (256, 224, 224, 3)
    the gather formulation was ~36%% of the whole b256 train step (profiled;
    EXPERIMENTS.md "Augmentation pipeline"); the matmul pair is ~17 GFLOP × 2,
    microseconds at MXU rates.  ``compute_dtype=bfloat16`` halves the bandwidth
    and runs the MXU at full rate with fp32 accumulation (preferred_element_type)
    — error ≤1 uint8 LSB, below the augmentation noise floor and exactly what
    the bf16 train step consumes anyway.  Pass float32 for exact-parity tests.
    """
    b, h, w, c = x.shape
    py = jnp.clip(py, 0.0, h - 1.0)
    px = jnp.clip(px, 0.0, w - 1.0)
    wy = _bilinear_weight_matrix(py, h, compute_dtype)   # (B, OH, H)
    wx = _bilinear_weight_matrix(px, w, compute_dtype)   # (B, OW, W)
    xc = x.astype(compute_dtype)
    # fp32 weights -> HIGHEST so the matmul really runs fp32 (TPU einsum
    # otherwise multiplies in bf16); bf16 weights run the MXU at full rate
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    rows = jnp.einsum("boh,bhwc->bowc", wy, xc, precision=prec,
                      preferred_element_type=jnp.float32).astype(compute_dtype)
    out = jnp.einsum("bpw,bowc->bopc", wx, rows, precision=prec,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def affine_grid(theta: jax.Array, out_hw: Tuple[int, int],
                in_hw: Tuple[int, int]) -> Tuple[jax.Array, jax.Array]:
    """Build per-sample sampling grids from 3x3 homographies.

    theta: (B, 3, 3) maps normalized output coords [-1,1]^2 -> normalized input
    coords.  Returns pixel-space (grid_y, grid_x), each (B, OH, OW)."""
    oh, ow = out_hw
    ih, iw = in_hw
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh * 2.0 - 1.0
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")            # (OH, OW)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (OH*OW, 3), (x, y, 1)
    mapped = jnp.einsum("bij,nj->bni", theta, pts)           # (B, N, 3)
    mx = mapped[..., 0] / mapped[..., 2]
    my = mapped[..., 1] / mapped[..., 2]
    # normalized [-1,1] -> pixel coords with half-pixel centers
    px = (mx + 1.0) * 0.5 * iw - 0.5
    py = (my + 1.0) * 0.5 * ih - 0.5
    b = theta.shape[0]
    return py.reshape(b, oh, ow), px.reshape(b, oh, ow)


def warp_affine(x: jax.Array, theta: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    gy, gx = affine_grid(theta, out_hw, x.shape[1:3])
    return grid_sample_bilinear(x, gy, gx)


# ---------------------------------------------------------------------------
# Color ops (torchvision ColorJitter semantics, reference: train.py:223-224)
# ---------------------------------------------------------------------------

# numpy, not jnp: a module-level device array would dispatch to the TPU at
# IMPORT time (and hang every CLI when the relay is unreachable)
_GRAY = np.array([0.299, 0.587, 0.114], np.float32)


def adjust_brightness(x: jax.Array, factor: jax.Array) -> jax.Array:
    # dtype-preserving (factors arrive fp32 from jax.random; promoting a bf16
    # image back to fp32 here would double the pipeline's HBM traffic)
    return jnp.clip(x * factor.astype(x.dtype)[..., None, None, None], 0.0, 1.0)


def adjust_contrast(x: jax.Array, factor: jax.Array) -> jax.Array:
    gray_mean = jnp.mean(jnp.tensordot(x, jnp.asarray(_GRAY, x.dtype),
                                       axes=([-1], [0])).astype(jnp.float32),
                         axis=(1, 2))[..., None, None, None].astype(x.dtype)
    f = factor.astype(x.dtype)[..., None, None, None]
    return jnp.clip(f * x + (1 - f) * gray_mean, 0.0, 1.0)


def adjust_saturation(x: jax.Array, factor: jax.Array) -> jax.Array:
    gray = jnp.tensordot(x, jnp.asarray(_GRAY, x.dtype), axes=([-1], [0]))[..., None]
    f = factor.astype(x.dtype)[..., None, None, None]
    return jnp.clip(f * x + (1 - f) * gray, 0.0, 1.0)


def adjust_hue(x: jax.Array, delta: jax.Array) -> jax.Array:
    """Hue shift by delta (fraction of a full turn, per-sample) via RGB<->HSV."""
    delta = delta.astype(x.dtype)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.maximum(rng_, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = (h + delta[..., None, None]) % 1.0
    # HSV -> RGB
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    out = jnp.stack([
        jnp.choose(i, [v, q, p, p, t, v], mode="clip"),
        jnp.choose(i, [t, v, v, q, p, p], mode="clip"),
        jnp.choose(i, [p, p, t, v, v, q], mode="clip"),
    ], axis=-1)
    return jnp.where(rng_[..., None] > 0, out, x)
