"""Fused Pallas stem kernel: normalize + conv3x3/s2 + BN + ReLU + maxpool3x3/s2
in ONE kernel pass.

This is the TPU-native replacement for the reference encoder's entry sequence
(reference: model.py:59-62 Normalize as the first layer; shufflenet stem =
conv1 3x3/s2 + BN + ReLU + maxpool 3x3/s2).  As separate XLA ops the stem is
the single largest line item of the flagship greedy-decode step (profiled at
b512: conv 0.79 ms + pool/BN/ReLU pass 0.46 ms of a ~4.7 ms step = 26%),
because

  * XLA cannot fuse elementwise ops or pooling into a convolution on TPU
    (convs are not fusion producers/consumers), so the conv output makes a
    full HBM round trip (154 MB @ b512) before the pool reads it back, and
  * the raw conv contracts only 3*3*3 = 27 input values per output, using
    ~5% of the MXU's 128-lane contraction depth.

The kernel fixes both at once:

  1. An XLA-side patch builder (``build_stem_patches``) reshapes the image
     into overlapping row-triplet blocks — all FREE reshapes plus one fused
     shift/concat pass — giving a (B, R, 72) patch tensor where each row
     holds the 3-row x 8-pixel x 3-channel input slab that produces FOUR
     adjacent conv outputs.
  2. The kernel adds the 9 left-carry lanes (the 3 pixels shared with the
     previous slab), normalizes in-register, and runs ONE MXU dot
     (R, 81) x (81, 4F) per image — 81/128 contraction and 96/128 output
     utilization vs 27/128 x 24/128 for the naive conv — then applies the
     folded BN bias, ReLU, and the full 3x3/s2 maxpool without any
     intermediate leaving VMEM.

Border semantics are exact: patches are zero where the conv pad is zero
*after* normalization (top-row mask + left-carry mask), matching
normalize-then-zero-pad; the pool's -inf padding is equivalent to 0 on
post-ReLU values.

Scope: stems of the shufflenet family shape (kernel 3x3, stride 2, pad 1,
C_in=3, followed by maxpool 3x3/s2/p1), inference path.  Training keeps the
XLA stem (autodiff).  Numerics: fp32 exact vs the unfused path (HIGHEST
matmul precision), bf16 within normal bf16 rounding — both pinned by
tests/test_stem_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stem_supported(input_size: int, features: int) -> bool:
    """The fused kernel handles square inputs with W divisible by 8 (patch
    blocks are 8 px) and H by 4 (conv rows pair + pool stride), and stem
    widths with 4*F <= 128 output lanes (shufflenet F=24 -> 96)."""
    return (input_size % 8 == 0 and input_size >= 32
            and 4 * features <= 128)


# arch prefix -> (conv param, bn param, activation, maxpool after stem).
# All share the 3x3/s2/p1 C_in=3 stem shape; only the epilogue differs.
STEM_PLANS = {
    "shufflenet": ("conv1", "bn1", "relu", True),
    "mobilenet_v2": ("stem", "stem_bn", "relu6", False),
    "mobilenet_v3": ("stem", "stem_bn", "hswish", False),
    "mnasnet": ("stem", "stem_bn", "relu", False),
}


def stem_plan(arch: str):
    """(conv_name, bn_name, act, pool) for archs the fused kernel covers."""
    for prefix, plan in STEM_PLANS.items():
        if arch.startswith(prefix):
            return plan
    return None


_ACTS = {
    "relu": lambda y: jnp.maximum(y, 0.0),
    "relu6": lambda y: jnp.clip(y, 0.0, 6.0),
    "hswish": lambda y: y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0),
}


def build_stem_patches(x: jax.Array) -> jax.Array:
    """(B, H, W, 3) -> (B, R, 72) overlapping row-triplet patches.

    Row (i, g) of R = (H/2)*(W/8) holds, for conv-output row i and 8-pixel
    column block g: [row 2i-1 | row 2i | row 2i+1], 24 elements (8 px x 3 ch)
    each, zeros for the top conv pad.  Pure reshapes plus one fused
    shift+concat (reads the image once, writes 1.5x — XLA fuses it with any
    upstream elementwise producer)."""
    b, h, w, c = x.shape
    assert c == 3 and w % 8 == 0 and h % 2 == 0
    ch, g = h // 2, w // 8
    xp = x.reshape(b, ch, 2, g, 24)
    a0 = xp[:, :, 0]                                 # rows 2i      (B,CH,G,24)
    a1 = xp[:, :, 1]                                 # rows 2i+1
    am1 = jnp.concatenate(                           # rows 2i-1 (zero top pad)
        [jnp.zeros_like(a1[:, :1]), a1[:, :-1]], axis=1)
    p = jnp.concatenate([am1, a0, a1], axis=-1)      # (B, CH, G, 72)
    return p.reshape(b, ch * g, 72)


def pack_stem_weights(kernel: jax.Array, bn_scale: jax.Array,
                      bn_bias: jax.Array, bn_mean: jax.Array,
                      bn_var: jax.Array, eps: float,
                      mean: Tuple[float, ...], std: Tuple[float, ...],
                      dtype=jnp.bfloat16):
    """Fold BN into the conv and lay the kernel out for the patch dot.

    kernel: (3, 3, 3, F) HWIO.  Returns (w81 (81, 4F), bnb (1, 4F),
    nsc (1, 72), nsh (1, 72)): the patch dot computes, for output column
    group positions p=0..3, ``relu(dot(norm(patch), w81) + bnb)`` ==
    ``relu(bn(conv(normalize(x))))``."""
    kh, kw, cin, f = kernel.shape
    assert (kh, kw, cin) == (3, 3, 3) and 4 * f <= 128
    sc = bn_scale / jnp.sqrt(bn_var + eps)                    # (F,)
    kf = kernel.astype(jnp.float32) * sc[None, None, None, :]
    # row index for tap (dy, dx) of output position p: in-block element when
    # (p, dx) != (0, 0), else one of the 9 carry lanes appended at 72..80
    rows = np.zeros((3, 3, 3, 4), np.int32)
    for dy in range(3):
        for dx in range(3):
            for c in range(3):
                for p in range(4):
                    if p == 0 and dx == 0:
                        rows[dy, dx, c, p] = 72 + 3 * dy + c
                    else:
                        rows[dy, dx, c, p] = 24 * dy + 3 * (2 * p + dx - 1) + c
    cols = np.arange(4)[None, None, None, :, None] * f + np.arange(f)
    w81 = jnp.zeros((81, 4 * f), jnp.float32)
    vals = jnp.broadcast_to(kf[:, :, :, None, :], (3, 3, 3, 4, f))
    w81 = w81.at[np.broadcast_to(rows[..., None], vals.shape),
                 np.broadcast_to(cols, vals.shape)].set(vals)
    bnb = jnp.tile(bn_bias - bn_mean * sc, 4)[None, :]        # (1, 4F)
    m3 = np.asarray(mean, np.float32)
    s3 = np.asarray(std, np.float32)
    nsc = jnp.asarray(np.tile(1.0 / s3, 24), jnp.float32)[None, :]   # (1,72)
    nsh = jnp.asarray(np.tile(-m3 / s3, 24), jnp.float32)[None, :]
    return w81.astype(dtype), bnb.astype(jnp.float32), nsc, nsh


def _kernel(p_ref, w_ref, bnb_ref, nsc_ref, nsh_ref, o_ref,
            *, g: int, ch: int, f: int, compute_dtype, act: str = "relu",
            pool: bool = True):
    f32 = jnp.float32
    P = p_ref[0]                                          # (R, 72)
    R = P.shape[0]
    xn = P.astype(f32) * nsc_ref[:] + nsh_ref[:]          # normalize
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, 72), 1)
    # top conv pad: conv row 0's "row -1" lanes must be zero AFTER normalize
    xn = jnp.where((ri < g) & (li < 24), 0.0, xn)
    xn = xn.astype(compute_dtype)
    # left-carry lanes: last 3 px of the previous column block (same conv
    # row => previous patch row), zeroed at g==0 (left conv pad)
    zrow = jnp.zeros((1, 72), compute_dtype)
    pm = jnp.concatenate([zrow, xn[:-1]], axis=0)
    pm = jnp.where((ri % g) == 0, jnp.asarray(0, compute_dtype), pm)
    A = jnp.concatenate([xn, pm[:, 21:24], pm[:, 45:48], pm[:, 69:72]],
                        axis=1)                           # (R, 81)
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == f32
            else jax.lax.Precision.DEFAULT)
    Y = jnp.dot(A, w_ref[:], precision=prec,
                preferred_element_type=f32)               # (R, 4F)
    Y = _ACTS[act](Y + bnb_ref[:]).astype(compute_dtype)
    if not pool:
        o_ref[0] = Y
        return
    # ---- maxpool 3x3 stride 2 pad 1, fully in VMEM --------------------
    # (pool composes only with relu: the 0-padded borders rely on
    # activations being >= 0)
    # column max: j-1 / j / j+1 where j = 4*block + p; crossing p=0 / p=3
    # pulls the neighbouring block (previous / next patch row)
    ys_d = jnp.concatenate([jnp.zeros((1, 4 * f), compute_dtype), Y[:-1]], 0)
    ys_d = jnp.where((ri % g) == 0, jnp.asarray(0, compute_dtype), ys_d)
    ys_u = jnp.concatenate([Y[1:], jnp.zeros((1, 4 * f), compute_dtype)], 0)
    ys_u = jnp.where((ri % g) == g - 1, jnp.asarray(0, compute_dtype), ys_u)
    yl = jnp.concatenate([ys_d[:, 3 * f:], Y[:, :3 * f]], axis=1)
    yr = jnp.concatenate([Y[:, f:], ys_u[:, :f]], axis=1)
    cm = jnp.maximum(jnp.maximum(Y, yl), yr)              # (R, 4F)
    # row max over conv rows 2r-1, 2r, 2r+1 then keep even columns
    # (p in {0, 2} -> output lanes (p', f))
    for r in range(ch // 2):
        lo = (2 * r - 1) * g
        mid = cm[2 * r * g:(2 * r + 1) * g]
        hi = cm[(2 * r + 1) * g:(2 * r + 2) * g]
        m = jnp.maximum(mid, hi)
        if lo >= 0:
            m = jnp.maximum(m, cm[lo:lo + g])
        o_ref[0, r * g:(r + 1) * g, :] = jnp.concatenate(
            [m[:, :f], m[:, 2 * f:3 * f]], axis=1)


def fused_stem_pool(x: jax.Array, kernel: jax.Array, bn_scale: jax.Array,
                    bn_bias: jax.Array, bn_mean: jax.Array, bn_var: jax.Array,
                    eps: float, mean: Tuple[float, ...],
                    std: Tuple[float, ...], act: str = "relu",
                    pool: bool = True, interpret: bool = None) -> jax.Array:
    """normalize -> conv3x3/s2/p1 -> BN(inference) -> act [-> maxpool3x3/s2/p1]
    as one fused kernel.  x: (B, H, W, 3) raw [0,1]; returns
    (B, H/4, W/4, F) with pool else (B, H/2, W/2, F)."""
    b, h, w, _ = x.shape
    f = kernel.shape[-1]
    assert stem_supported(h, f) and h == w, (h, w, f)
    assert act in _ACTS and (act == "relu" or not pool)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cd = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    p = build_stem_patches(x.astype(cd))
    w81, bnb, nsc, nsh = pack_stem_weights(
        kernel, bn_scale, bn_bias, bn_mean, bn_var, eps, mean, std, dtype=cd)
    ch, g = h // 2, w // 8
    r = ch * g
    ro, lo = ((ch // 2) * g, 2 * f) if pool else (r, 4 * f)
    kern = functools.partial(_kernel, g=g, ch=ch, f=f, compute_dtype=cd,
                             act=act, pool=pool)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, 72), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(w81), full(bnb), full(nsc), full(nsh)],
        out_specs=pl.BlockSpec((1, ro, lo), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ro, lo), cd),
        interpret=interpret,
    )(p, w81, bnb, nsc, nsh)
    # rows (r, g) x lanes (p, f) -> NHWC: out col = (4 if nopool else 2)*g + p
    npos = 2 if pool else 4
    rows = ch // 2 if pool else ch
    return out.reshape(b, rows, g, npos, f).reshape(
        b, rows, npos * g, f).astype(x.dtype)


def stem_pool_reference(x: jax.Array, kernel: jax.Array, bn_scale: jax.Array,
                        bn_bias: jax.Array, bn_mean: jax.Array,
                        bn_var: jax.Array, eps: float,
                        mean: Tuple[float, ...], std: Tuple[float, ...],
                        act: str = "relu", pool: bool = True) -> jax.Array:
    """Unfused jnp oracle: the exact op sequence the kernel replaces."""
    from flax import linen as nn
    m = jnp.asarray(mean, x.dtype)
    s = jnp.asarray(std, x.dtype)
    xn = (x - m) / s
    dn = jax.lax.conv_dimension_numbers(xn.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xn, kernel.astype(x.dtype), (2, 2),
                                     [(1, 1), (1, 1)], dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    sc = bn_scale / jnp.sqrt(bn_var + eps)
    y = y * sc + (bn_bias - bn_mean * sc)
    y = _ACTS[act](y).astype(x.dtype)
    if not pool:
        return y
    return nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
