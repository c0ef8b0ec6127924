"""Fused Pallas stem kernel: normalize + stem conv (3x3 or 7x7, stride 2) +
BN + activation [+ maxpool 3x3/s2] in ONE kernel pass.

This is the TPU-native replacement for the reference encoder's entry sequence
(reference: model.py:59-62 Normalize as the first layer; each torchvision
backbone's stem conv + BN + act (+ maxpool)).  As separate XLA ops the stem is
the single largest line item of the flagship greedy-decode step (profiled at
b512 shufflenet: conv 0.79 ms + pool/BN/ReLU pass 0.46 ms of a ~4.7 ms step =
26%), because

  * XLA cannot fuse elementwise ops or pooling into a convolution on TPU
    (convs are not fusion producers/consumers), so the conv output makes a
    full HBM round trip (154 MB @ b512) before the pool reads it back, and
  * a 3-channel stem conv contracts only kh*kw*3 input values per output
    (27 for 3x3) — ~4% of the MXU's 128-lane contraction depth.

The kernel fixes both at once:

  1. An XLA-side patch builder (``build_stem_patches``) reshapes the image
     into overlapping row-slab blocks — all FREE reshapes plus one fused
     shift/concat pass — giving a (B, R, K_main) patch tensor where each row
     holds the kh-row x blk_px-pixel x 3-channel input slab that produces
     ``npos`` adjacent conv outputs.
  2. The kernel appends the left/right carry lanes (pixels shared with the
     neighbouring slabs), normalizes in-register, and runs ONE MXU dot
     (R, K) x (K, npos*F) per image — e.g. 81/128 x 96/128 utilization for
     the shufflenet stem vs 27/128 x 24/128 for the naive conv — then
     applies the folded BN bias, the activation, and (for pool stems) the
     full 3x3/s2 maxpool without any intermediate leaving VMEM.

Geometries (``_geom``): 3x3 stems pack 4 outputs/row (shufflenet F=24,
mobilenet F=16/32, mnasnet); 7x7 stems pack 2 (resnet/resnext/wide_resnet/
densenet F=64).  Border semantics are exact: patch positions where the conv
pad is zero are re-zeroed AFTER normalization (matching normalize-then-pad),
and the pool's -inf padding is equivalent to 0 on post-ReLU values.

Scope: inference path; training keeps the XLA stem (autodiff).  Numerics:
fp32 exact vs the unfused path (HIGHEST matmul precision), bf16 within
normal bf16 rounding — both pinned by tests/test_stem_kernel.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _Geom(NamedTuple):
    kh: int       # square stem kernel size
    blk_px: int   # input pixels per patch block
    npos: int     # conv outputs per block (= blk_px // 2)
    lpx: int      # left-carry pixels (kernel reach past the block start)
    rpx: int      # right-carry pixels


def _geom(kh: int, f: int) -> Optional[_Geom]:
    """Pick the widest packing whose output lanes fit the 128-lane MXU."""
    if kh == 3:
        if 4 * f <= 128:
            return _Geom(3, 8, 4, 1, 0)
        if 2 * f <= 128:
            return _Geom(3, 4, 2, 1, 0)
    if kh == 7 and 2 * f <= 128:
        return _Geom(7, 4, 2, 3, 2)
    return None


def stem_supported(input_size: int, features: int, kernel_size: int = 3) -> bool:
    g = _geom(kernel_size, features)
    return (g is not None and input_size >= 32
            and input_size % (2 * g.blk_px) == 0 and input_size % 4 == 0)


# arch prefix -> (conv param, bn param, activation, maxpool, kernel size).
# Stem shapes: conv kh x kh / stride 2 / pad (kh-1)//2, C_in=3.
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
    """(conv, bn, act, pool, kh) for archs the fused kernel covers."""
    for prefix, plan in STEM_PLANS.items():
        if arch.startswith(prefix):
            return plan
    return None


_ACTS = {
    "relu": lambda y: jnp.maximum(y, 0.0),
    "relu6": lambda y: jnp.clip(y, 0.0, 6.0),
    "hswish": lambda y: y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0),
}


def build_stem_patches(x: jax.Array, geom: _Geom = _geom(3, 24)) -> jax.Array:
    """(B, H, W, 3) -> (B, R, kh*3*blk_px) overlapping row-slab patches.

    Row (i, g) of R = (H/2)*(W/blk_px) holds, for conv-output row i and
    pixel block g, input rows 2i-pad .. 2i+pad over the block's blk_px
    pixels (3 channels interleaved), zeros where rows fall outside the
    image.  Pure reshapes plus one fused shift+concat pass."""
    b, h, w, c = x.shape
    kh, blk = geom.kh, geom.blk_px
    assert c == 3 and w % blk == 0 and h % 2 == 0
    ch, g = h // 2, w // blk
    pad = (kh - 1) // 2
    xp = x.reshape(b, ch, 2, g, 3 * blk)
    halves = (xp[:, :, 0], xp[:, :, 1])          # rows 2i / 2i+1
    slabs = []
    for dy in range(kh):
        off = dy - pad
        half = off % 2                            # python %: always 0/1
        s = (off - half) // 2                     # row-pair shift
        sl = halves[half]
        if s < 0:
            sl = jnp.concatenate(
                [jnp.zeros_like(sl[:, :(-s)]), sl[:, :s]], axis=1)
        elif s > 0:
            sl = jnp.concatenate(
                [sl[:, s:], jnp.zeros_like(sl[:, :s])], axis=1)
        slabs.append(sl)
    p = jnp.concatenate(slabs, axis=-1)           # (B, CH, G, kh*3*blk)
    return p.reshape(b, ch * g, kh * 3 * blk)


def pack_stem_weights(kernel: jax.Array, bn_scale: jax.Array,
                      bn_bias: jax.Array, bn_mean: jax.Array,
                      bn_var: jax.Array, eps: float,
                      mean: Tuple[float, ...], std: Tuple[float, ...],
                      geom: _Geom, dtype=jnp.bfloat16):
    """Fold BN into the conv and lay the kernel out for the patch dot.

    kernel: (kh, kh, 3, F) HWIO.  Returns (wk (K, npos*F), bnb (1, npos*F),
    nsc (1, kh*3*blk), nsh (1, kh*3*blk)): the patch dot computes
    ``act(dot(norm(patch), wk) + bnb)`` == ``act(bn(conv(normalize(x))))``."""
    kh, blk, npos, lpx, rpx = geom
    khk, kwk, cin, f = kernel.shape
    assert (khk, kwk, cin) == (kh, kh, 3) and npos * f <= 128
    pad = (kh - 1) // 2
    main, lc = kh * 3 * blk, kh * 3 * lpx
    k_tot = main + lc + kh * 3 * rpx
    sc = bn_scale / jnp.sqrt(bn_var + eps)                    # (F,)
    kf = kernel.astype(jnp.float32) * sc[None, None, None, :]
    rows = np.zeros((kh, kh, 3, npos), np.int32)
    for dy in range(kh):
        for dx in range(kh):
            for c in range(3):
                for p in range(npos):
                    px = 2 * p + dx - pad
                    if 0 <= px < blk:
                        rows[dy, dx, c, p] = dy * 3 * blk + 3 * px + c
                    elif px < 0:
                        rows[dy, dx, c, p] = (main + dy * 3 * lpx
                                              + 3 * (px + lpx) + c)
                    else:
                        rows[dy, dx, c, p] = (main + lc + dy * 3 * rpx
                                              + 3 * (px - blk) + c)
    cols = (np.arange(npos)[None, None, None, :, None] * f + np.arange(f))
    wk = jnp.zeros((k_tot, npos * f), jnp.float32)
    vals = jnp.broadcast_to(kf[:, :, :, None, :], (kh, kh, 3, npos, f))
    wk = wk.at[np.broadcast_to(rows[..., None], vals.shape),
               np.broadcast_to(cols, vals.shape)].set(vals)
    bnb = jnp.tile(bn_bias - bn_mean * sc, npos)[None, :]     # (1, npos*F)
    m3 = np.asarray(mean, np.float32)
    s3 = np.asarray(std, np.float32)
    # normalize vectors in the kernel's compute dtype: a bf16 multiply-add
    # matches the bf16 XLA pipeline's rounding and avoids an f32 round-trip
    # over the whole patch tensor in VMEM
    nsc = jnp.asarray(np.tile(1.0 / s3, kh * blk), dtype)[None, :]
    nsh = jnp.asarray(np.tile(-m3 / s3, kh * blk), dtype)[None, :]
    return wk.astype(dtype), bnb.astype(jnp.float32), nsc, nsh


def _kernel(p_ref, w_ref, bnb_ref, nsc_ref, nsh_ref, o_ref,
            *, geom: _Geom, g: int, ch: int, f: int, compute_dtype,
            act: str, pool: bool):
    f32 = jnp.float32
    kh, blk, npos, lpx, rpx = geom
    pad = (kh - 1) // 2
    n3 = 3 * blk
    P = p_ref[0]                                          # (R, kh*3*blk)
    R = P.shape[0]
    xn = P * nsc_ref[:] + nsh_ref[:]          # normalize (compute dtype)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    ib = ri // g                                          # conv row index
    li = jax.lax.broadcasted_iota(jnp.int32, (1, kh * n3), 1)
    # conv pad rows must be zero AFTER normalize (the builder zero-fills
    # them; normalize shifted that — re-zero per dy slab where the source
    # row 2i + dy - pad falls outside [0, 2*ch-1])
    for dy in range(kh):
        off = dy - pad
        if off >= 0 and 2 * (ch - 1) + off <= 2 * ch - 1:
            continue                                      # always valid
        bad = (2 * ib + off < 0) | (2 * ib + off > 2 * ch - 1)
        lane = (li >= dy * n3) & (li < (dy + 1) * n3)
        xn = jnp.where(bad & lane, jnp.asarray(0, compute_dtype), xn)
    zrow = jnp.zeros((1, kh * n3), compute_dtype)
    parts = [xn]
    if lpx:  # previous block's last lpx pixels, zeroed at g==0 (left pad)
        pm = jnp.concatenate([zrow, xn[:-1]], axis=0)
        pm = jnp.where((ri % g) == 0, jnp.asarray(0, compute_dtype), pm)
        parts += [pm[:, dy * n3 + 3 * (blk - lpx):(dy + 1) * n3]
                  for dy in range(kh)]
    if rpx:  # next block's first rpx pixels, zeroed at g==G-1 (right pad)
        pu = jnp.concatenate([xn[1:], zrow], axis=0)
        pu = jnp.where((ri % g) == g - 1, jnp.asarray(0, compute_dtype), pu)
        parts += [pu[:, dy * n3:dy * n3 + 3 * rpx] for dy in range(kh)]
    A = jnp.concatenate(parts, axis=1)                    # (R, K)
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == f32
            else jax.lax.Precision.DEFAULT)
    Y = jnp.dot(A, w_ref[:], precision=prec,
                preferred_element_type=f32)               # (R, npos*F)
    Y = _ACTS[act](Y + bnb_ref[:]).astype(compute_dtype)
    if not pool:
        o_ref[0] = Y
        return
    # ---- maxpool 3x3 stride 2 pad 1, fully in VMEM --------------------
    # (pool composes only with relu: the 0-padded borders rely on
    # activations being >= 0)
    # column max: j-1 / j / j+1 where j = npos*block + p; crossing p=0 /
    # p=npos-1 pulls the neighbouring block (previous / next patch row)
    nf = npos * f
    ys_d = jnp.concatenate([jnp.zeros((1, nf), compute_dtype), Y[:-1]], 0)
    ys_d = jnp.where((ri % g) == 0, jnp.asarray(0, compute_dtype), ys_d)
    ys_u = jnp.concatenate([Y[1:], jnp.zeros((1, nf), compute_dtype)], 0)
    ys_u = jnp.where((ri % g) == g - 1, jnp.asarray(0, compute_dtype), ys_u)
    yl = jnp.concatenate([ys_d[:, (npos - 1) * f:], Y[:, :(npos - 1) * f]], 1)
    yr = jnp.concatenate([Y[:, f:], ys_u[:, :f]], axis=1)
    cm = jnp.maximum(jnp.maximum(Y, yl), yr)              # (R, npos*F)
    # row max over conv rows 2r-1, 2r, 2r+1 then keep even columns
    # (p even -> output lanes ((npos//2) blocks, f))
    keep = lambda m: jnp.concatenate(
        [m[:, 2 * k * f:(2 * k + 1) * f] for k in range(npos // 2)], axis=1) \
        if npos > 2 else m[:, :f]
    for r in range(ch // 2):
        lo = (2 * r - 1) * g
        mid = cm[2 * r * g:(2 * r + 1) * g]
        hi = cm[(2 * r + 1) * g:(2 * r + 2) * g]
        m = jnp.maximum(mid, hi)
        if lo >= 0:
            m = jnp.maximum(m, cm[lo:lo + g])
        o_ref[0, r * g:(r + 1) * g, :] = keep(m)


def fused_stem_pool(x: jax.Array, kernel: jax.Array, bn_scale: jax.Array,
                    bn_bias: jax.Array, bn_mean: jax.Array, bn_var: jax.Array,
                    eps: float, mean: Tuple[float, ...],
                    std: Tuple[float, ...], act: str = "relu",
                    pool: bool = True, interpret: bool = None) -> jax.Array:
    """normalize -> conv/s2 -> BN(inference) -> act [-> maxpool3x3/s2/p1]
    as one fused kernel.  x: (B, H, W, 3) raw [0,1]; returns
    (B, H/4, W/4, F) with pool else (B, H/2, W/2, F)."""
    b, h, w, _ = x.shape
    kh, f = kernel.shape[0], kernel.shape[-1]
    geom = _geom(kh, f)
    assert geom is not None and stem_supported(h, f, kh) and h == w, \
        (h, w, kh, f)
    assert act in _ACTS and (act == "relu" or not pool)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cd = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    p = build_stem_patches(x.astype(cd), geom)
    wk, bnb, nsc, nsh = pack_stem_weights(
        kernel, bn_scale, bn_bias, bn_mean, bn_var, eps, mean, std, geom,
        dtype=cd)
    ch, g = h // 2, w // geom.blk_px
    r = ch * g
    npos = geom.npos
    if pool:
        ro, lo_l, rows, ncol = (ch // 2) * g, (npos // 2) * f, ch // 2, npos // 2
    else:
        ro, lo_l, rows, ncol = r, npos * f, ch, npos
    kern = functools.partial(_kernel, geom=geom, g=g, ch=ch, f=f,
                             compute_dtype=cd, act=act, pool=pool)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, p.shape[-1]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(wk), full(bnb), full(nsc), full(nsh)],
        out_specs=pl.BlockSpec((1, ro, lo_l), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ro, lo_l), cd),
        interpret=interpret,
        # the 7x7 geometries (R=6272, K=189 at 224px) put ~24 MB of
        # intermediates (patch tensor, dot output, pool temporaries) on the
        # kernel stack — past Mosaic's 16 MB default scoped-vmem limit
        # (validated OOM on v5e, tools/validate_stem_tpu.py).  v5e has
        # 128 MB of VMEM; one image-block in flight leaves plenty.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024),
    )(p, wk, bnb, nsc, nsh)
    # rows (r, g) x lanes (p, f) -> NHWC: out col = ncol*g + p
    return out.reshape(b, rows, g, ncol, f).reshape(
        b, rows, ncol * g, f).astype(x.dtype)


def fused_stem_pool_sharded(x: jax.Array, kernel: jax.Array,
                            bn_scale: jax.Array, bn_bias: jax.Array,
                            bn_mean: jax.Array, bn_var: jax.Array, eps: float,
                            mean: Tuple[float, ...], std: Tuple[float, ...],
                            mesh, act: str = "relu", pool: bool = True,
                            interpret: bool = None) -> jax.Array:
    """fused_stem_pool under a sharded mesh.

    pallas_call has no GSPMD partitioning rules, so under a multi-device
    program XLA would otherwise gather the global batch onto one device.
    The stem is embarrassingly parallel over batch (the kernel grid is
    already (B,)), so a shard_map over the batch axes runs the kernel
    per-shard with zero collectives: images stay P((all mesh axes)) — this
    framework shards batches over EVERY axis (see parallel/mesh.py
    data_sharding and the GSPMD grouped-conv trap it pins) — and the stem
    weights are replicated."""
    from jax.sharding import PartitionSpec as P

    batch_spec = P(tuple(mesh.axis_names))
    rep = P()

    def local(xx, k, sc, bb, mu, var):
        return fused_stem_pool(xx, k, sc, bb, mu, var, eps, mean, std,
                               act=act, pool=pool, interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(batch_spec, rep, rep, rep, rep, rep),
        out_specs=batch_spec,
        # pallas_call's ShapeDtypeStruct carries no varying-mesh-axes info,
        # which the vma checker requires; the manual specs above are complete
        check_vma=False)(x, kernel, bn_scale, bn_bias, bn_mean, bn_var)


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
    pad = (kernel.shape[0] - 1) // 2
    dn = jax.lax.conv_dimension_numbers(xn.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xn, kernel.astype(x.dtype), (2, 2),
                                     [(pad, pad), (pad, pad)],
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    sc = bn_scale / jnp.sqrt(bn_var + eps)
    y = y * sc + (bn_bias - bn_mean * sc)
    y = _ACTS[act](y).astype(x.dtype)
    if not pool:
        return y
    return nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
