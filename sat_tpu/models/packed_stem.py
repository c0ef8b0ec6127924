"""Space-to-depth packed stem for 3x3/stride-2 stems (shufflenet_v2 family).

The stem is ~22% of the flagship greedy-decode step (EXPERIMENTS.md round-2
closing profile): a 3x3 stride-2 conv producing 24 channels and a 3x3
stride-2 maxpool over them.  24 output channels use 24 of the TPU's 128
lanes — the conv and the 14 MB pool reduce both run mostly on padding.

This module re-expresses the whole stem EXACTLY (same taps, same zero
padding, fp32-associativity aside) in a 2x2 space-to-depth packed layout
WITHOUT any input relayout:

* conv1 becomes ONE 5x5 stride-4 convolution whose output channel axis packs
  the 2x2 output-pixel block: out'(i, j, (p,q,o)) = conv1_out(2i+p, 2j+q, o).
  The 5x5 kernel is the 3x3 kernel scattered at static offsets
  (u, v) = (2p+di+1, 2q+dj+1) per packed plane — 96 output lanes instead of
  24, and the stride-4 im2col reads the raw NHWC image directly (a literal
  space-to-depth would relayout the full 224^2 input first).
* the input Normalize folds into the packed kernel exactly like
  backbones.FoldedStemConv (linear in x, zero-padded borders corrected by a
  ones-image conv — a (1, H, W, 3) cost).
* BatchNorm + relu apply with the (24,) vectors tiled x4 (packed channel
  index is (2p+q)*24 + o, o minor).
* the 3x3 stride-2 maxpool becomes a max over NINE shifted (H/4, W/4)
  slices of the (-inf-padded) packed tensor: pool row 2u+du lives in packed
  plane/row (i, p) with 2i+p = 2u+du, i.e. (u-1, 1), (u, 0), (u, 1) — one
  fused elementwise pass over the 4x-smaller packed tensor instead of a
  reduce_window over the 112^2 x 24 map, and it UNPACKS for free (selecting
  plane (p,q) is a contiguous channel slice), so stage2 consumes the normal
  (H/4, W/4, 24) layout.

Numerics: identical term sets per output element; only fp32 summation order
inside the MXU differs.  Pinned vs the unfused path by
tests/test_packed_stem.py.  Train mode keeps the standard flax path (BN batch
stats + running-average updates live there); this is the inference stem.

Reference analogue: none — the reference's stem is cuDNN's stride-2 conv
(torchvision shufflenet_v2, reference model.py:28-43); this packing exists
because of the TPU's 128-lane vector layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_LARGE = -3.0e38  # -inf stand-in that survives bf16 casts

# arch prefix -> (conv param, bn param, activation, maxpool, kernel size).
# Stem shapes: conv kh x kh / stride 2 / pad (kh-1)//2, C_in=3.  (Moved here
# from the retired fused Pallas stem kernel — kernels/stem.py in git history,
# removed after losing its third hardware A/B; EXPERIMENTS.md "stem kernel
# retired".)
STEM_PLANS = {
    "shufflenet": ("conv1", "bn1", "relu", True, 3),
    "mobilenet_v2": ("stem", "stem_bn", "relu6", False, 3),
    "mobilenet_v3": ("stem", "stem_bn", "hswish", False, 3),
    "mnasnet": ("stem", "stem_bn", "relu", False, 3),
    "resnet": ("conv1", "bn1", "relu", True, 7),
    "resnext": ("conv1", "bn1", "relu", True, 7),
    "wide_resnet": ("conv1", "bn1", "relu", True, 7),
    "densenet": ("conv0", "norm0", "relu", True, 7),
}


def stem_plan(arch: str):
    """(conv, bn, act, pool, kh) for archs whose stem the packed/foldable
    re-expressions understand."""
    for prefix, plan in STEM_PLANS.items():
        if arch.startswith(prefix):
            return plan
    return None


def pack_stem_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, C_in, C_out) stride-2 kernel -> (5, 5, C_in, 4*C_out) stride-4
    kernel whose output channels pack the 2x2 output-pixel block
    ((2p+q)*C_out + o, o minor)."""
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3
    w5 = jnp.zeros((5, 5, ci, 4 * co), kernel.dtype)
    for p in (0, 1):
        for q in (0, 1):
            blk = (2 * p + q) * co
            w5 = w5.at[2 * p:2 * p + 3, 2 * q:2 * q + 3, :,
                       blk:blk + co].set(kernel)
    return w5


def packed_stem_supported(h: int, w: int, kernel: jax.Array,
                          strides=(2, 2), padding=1, pool=(3, 2, 1)) -> bool:
    """The packing covers the flagship geometry: 3x3/s2/p1 conv + 3x3/s2/p1
    maxpool on inputs whose side is a multiple of 4."""
    return (kernel.shape[:2] == (3, 3) and tuple(strides) == (2, 2)
            and padding == 1 and tuple(pool) == (3, 2, 1)
            and h == w and h % 4 == 0 and h >= 8)


def packed_stem_pool(images: jax.Array, kernel: jax.Array,
                     bn_scale: jax.Array, bn_bias: jax.Array,
                     bn_mean: jax.Array, bn_var: jax.Array, eps: float,
                     norm_mean: Optional[Sequence[float]],
                     norm_std: Optional[Sequence[float]]) -> jax.Array:
    """[normalize ->] conv3x3s2p1 -> BN(running stats) -> relu ->
    maxpool3x3s2p1, all in the packed layout.  images: (B, H, W, 3) raw
    [0,1]; returns (B, H/4, W/4, C_out) in the standard layout."""
    b, h, w, ci = images.shape
    co = kernel.shape[-1]
    dt = jnp.promote_types(images.dtype, kernel.dtype)
    x = images.astype(dt)
    k = kernel.astype(dt)

    dn = jax.lax.conv_dimension_numbers((b, h, w, ci), (5, 5, ci, 4 * co),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(1, 0), (1, 0)]   # taps span rows 4i-1 .. 4i+3; only -1 pads
    conv = lambda lhs, w5: jax.lax.conv_general_dilated(
        lhs, w5, (4, 4), pad, dimension_numbers=dn)

    if norm_mean is not None:
        # fold Normalize((x - m) / s) into the kernel (FoldedStemConv math)
        inv = jnp.asarray([1.0 / s for s in norm_std], dt)
        mi = jnp.asarray([m / s for m, s in zip(norm_mean, norm_std)], dt)
        w5s = pack_stem_kernel(k * inv[None, None, :, None])
        w5m = pack_stem_kernel(k * mi[None, None, :, None])
        ones = jnp.ones((1, h, w, ci), dt)
        y = conv(x, w5s) - conv(ones, w5m)
    else:
        y = conv(x, pack_stem_kernel(k))

    # BN (inference: running stats) + relu, per-channel vectors tiled over
    # the 4 packed planes (packed channel = (2p+q)*co + o, o minor)
    scale = (bn_scale * jax.lax.rsqrt(bn_var + eps)).astype(dt)
    bias = (bn_bias - bn_mean * bn_scale * jax.lax.rsqrt(bn_var + eps)).astype(dt)
    y = y * jnp.tile(scale, 4) + jnp.tile(bias, 4)
    y = jnp.maximum(y, 0)

    # maxpool 3x3 s2 p1 over the virtual (H/2, W/2, co) map == max of nine
    # shifted slices of the packed tensor: window row 2u+du sits in packed
    # (row, plane) = (u-1, 1), (u, 0), (u, 1); pad row/col -1 with -inf
    hp, wp = h // 4, w // 4
    yp = jnp.pad(y, ((0, 0), (1, 0), (1, 0), (0, 0)),
                 constant_values=NEG_LARGE)
    terms = []
    combos = ((0, 1), (1, 0), (1, 1))       # (slice offset, packed plane)
    for ri, p in combos:
        for rj, q in combos:
            blk = (2 * p + q) * co
            terms.append(jax.lax.dynamic_slice(
                yp, (0, ri, rj, blk), (b, hp, wp, co)))
    out = terms[0]
    for t in terms[1:]:
        out = jnp.maximum(out, t)
    return out
