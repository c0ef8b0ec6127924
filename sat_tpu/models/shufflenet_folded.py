"""Whole-net channel-permutation folding for ShuffleNetV2 inference.

The shufflenet channel shuffle after every unit is a pure channel
PERMUTATION (riffle: out[2i]=left[i], out[2i+1]=right[i]).  On TPU the
riffle is a lane interleave — XLA emits a {0,3,2,1,4}->{0,4,3,2,1}
transpose copy + reshape pair per unit, measured at **2.50 ms/batch of the
5.66 ms b512 greedy-decode step (44%)** (EXPERIMENTS.md "corrected decode
profile").  This module removes every one of them by carrying the
permutation SYMBOLICALLY and folding it into the channel consumers:

* the physical tensor's channel order is tracked as a static layout array
  ``lam`` (``lam[p]`` = logical channel at physical position p), planned in
  pure Python at trace time;
* 1x1 convs absorb any input permutation by row-gathering their kernels
  (weight-sized ops, free next to the activation relayouts they replace);
  a stride-1 unit's pw1 reads the FULL physical tensor through a
  zero-padded full-width kernel — the MXU runs 2x the (tiny) contraction
  width instead of the activations paying a gather;
* depthwise convs absorb it by permuting their kernel's channel axis (the
  permutation then rides through to the next 1x1);
* BatchNorm vectors permute alongside their producer;
* the stride-1 passthrough half is never shuffled: the unit output is a
  concat of a few CONTIGUOUS channel slices of the input plus the fresh
  right-branch tensor (the layout plan keeps fragmentation to <=6 slices
  across stage 3's 8 units — see the planner), which XLA writes as plain
  offset stores instead of lane interleaves;
* ``conv5`` (and any trailing permutation) is absorbed by its own row
  gather, so the exported feature map is in the standard logical order and
  everything downstream (projection, attention, checkpoints, the
  torchvision converter) is untouched.

Numerics: identical term sets per output element; only the fp contraction
order over (permuted / zero-padded) input channels differs.  Parity with
the flax path is pinned by tests/test_shufflenet_folded.py.  Train mode
keeps the flax module (BN batch stats live there).

Reference analogue: none — the reference runs torchvision's
``channel_shuffle`` as a real data movement on cuDNN tensors
(reference model.py:28-43 builds the torchvision encoder); this folding
exists because of the TPU's (8,128) tiled vector layout.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

_REPEATS = (4, 8, 4)   # ShuffleNetV2 stage unit counts (first unit stride-2)


# =========================================================================
# Static layout planner (pure Python / numpy — runs once per geometry)
# =========================================================================


def _runs_of(positions: np.ndarray) -> List[Tuple[int, int]]:
    """Maximal contiguous runs [(start, stop_inclusive), ...] of a sorted
    position array."""
    runs, start, prev = [], int(positions[0]), int(positions[0])
    for p in positions[1:]:
        p = int(p)
        if p == prev + 1:
            prev = p
        else:
            runs.append((start, prev))
            start = prev = p
    runs.append((start, prev))
    return runs


@lru_cache(maxsize=8)
def plan_stages(stage_out: Tuple[int, ...]) -> Tuple[Tuple[Any, ...], ...]:
    """Per-unit fold plans for the three shufflenet stages.

    Returns (plans, final_lam) where plans[i] is either
      ("s2", lam_in)                       — stride-2 unit: fold lam_in into
                                             b1_dw/b1_pw/b2_pw1 kernels
      ("s1", pos_right, runs)              — stride-1 unit: pw1 reads the full
                                             tensor via a zero-padded kernel
                                             whose live rows sit at pos_right;
                                             output = concat(x[runs...], y)
    and final_lam is the layout entering conv5 (absorbed by its row gather).
    All arrays are numpy (static — indexing weights at trace time)."""
    lam = np.arange(24)   # every torchvision shufflenet variant stems to 24
    plans: List[Tuple[Any, ...]] = []
    for out_ch, reps in zip(stage_out[:3], _REPEATS):
        c = out_ch // 2
        plans.append(("s2", lam.copy()))
        # stride-2 output: [left | right] blocks, each emitted in logical
        # order -> lam[p<c] = 2p (evens), lam[c+i] = 2i+1 (odds)
        lam = np.concatenate([2 * np.arange(c), 2 * np.arange(c) + 1])
        for _ in range(reps - 1):
            pos = np.argsort(lam)                 # logical -> physical
            pos_right = pos[c:].copy()            # positions of logical [c,2c)
            passthrough = np.sort(pos[:c])
            runs = _runs_of(passthrough)
            plans.append(("s1", pos_right, tuple(runs)))
            kept = np.concatenate(
                [np.arange(a, b + 1) for a, b in runs])
            lam = np.concatenate([2 * lam[kept], 2 * np.arange(c) + 1])
    return tuple(plans), lam


# =========================================================================
# Pure-jnp building blocks (eval mode — running BN stats)
# =========================================================================


def _conv(x: jax.Array, k: jax.Array, stride: int = 1, padding: int = 0,
          groups: int = 1) -> jax.Array:
    dt = jnp.promote_types(x.dtype, k.dtype)
    x, k = x.astype(dt), k.astype(dt)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=dn, feature_group_count=groups)


def _bn(x: jax.Array, params: Dict, stats: Dict, eps: float = 1e-5,
        perm: Optional[np.ndarray] = None) -> jax.Array:
    """Inference BatchNorm, matching flax's (x - mean) * mul + bias form.
    perm permutes the per-channel vectors to the tensor's physical order."""
    scale, bias = params["scale"], params["bias"]
    mean, var = stats["mean"], stats["var"]
    if perm is not None:
        scale, bias = scale[perm], bias[perm]
        mean, var = mean[perm], var[perm]
    dt = jnp.promote_types(x.dtype, scale.dtype)
    mul = scale.astype(dt) * jax.lax.rsqrt(var.astype(dt) + eps)
    return (x.astype(dt) - mean.astype(dt)) * mul + bias.astype(dt)


def _stem(params: Dict, stats: Dict, x: jax.Array,
          mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """FoldedStemConv math (backbones.py) + bn1 + relu + maxpool3x3s2p1."""
    k = params["conv1"]["kernel"]
    dt = jnp.promote_types(x.dtype, k.dtype)
    x, k = x.astype(dt), k.astype(dt)
    inv = jnp.asarray([1.0 / s for s in std], dt)
    mi = jnp.asarray([m / s for m, s in zip(mean, std)], dt)
    ones = jnp.ones((1,) + x.shape[1:3] + (3,), dt)
    y = (_conv(x, k * inv[None, None, :, None], stride=2, padding=1)
         - _conv(ones, k * mi[None, None, :, None], stride=2, padding=1))
    y = jnp.maximum(_bn(y, params["bn1"], stats["bn1"]), 0)
    return nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))


def _unit_s2(params: Dict, stats: Dict, x: jax.Array,
             lam: np.ndarray) -> jax.Array:
    """Stride-2 ShuffleUnit with the input layout lam folded into every
    channel consumer; output physical = [left | right] (lam handled by the
    planner)."""
    cin = x.shape[-1]
    # left branch: dw s2 (kernel channels permuted; layout rides through)
    left = _conv(x, params["b1_dw"]["kernel"][:, :, :, lam], stride=2,
                 padding=1, groups=cin)
    left = _bn(left, params["b1_dwbn"], stats["b1_dwbn"], perm=lam)
    left = _conv(left, params["b1_pw"]["kernel"][:, :, lam, :])
    left = jnp.maximum(_bn(left, params["b1_pwbn"], stats["b1_pwbn"]), 0)
    # right branch: pw1 absorbs lam via a kernel row gather
    y = _conv(x, params["b2_pw1"]["kernel"][:, :, lam, :])
    y = jnp.maximum(_bn(y, params["b2_pw1bn"], stats["b2_pw1bn"]), 0)
    y = _conv(y, params["b2_dw"]["kernel"], stride=2, padding=1,
              groups=y.shape[-1])
    y = _bn(y, params["b2_dwbn"], stats["b2_dwbn"])
    y = _conv(y, params["b2_pw2"]["kernel"])
    y = jnp.maximum(_bn(y, params["b2_pw2bn"], stats["b2_pw2bn"]), 0)
    return jnp.concatenate([left, y], axis=-1)


def _unit_s1(params: Dict, stats: Dict, x: jax.Array, pos_right: np.ndarray,
             runs: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Stride-1 ShuffleUnit: pw1 reads the FULL physical tensor through a
    zero-padded kernel (live rows at pos_right), the passthrough half is a
    concat of contiguous slices — no channel data movement anywhere."""
    k1 = params["b2_pw1"]["kernel"]          # (1, 1, c, c) logical rows
    cin, cout = x.shape[-1], k1.shape[-1]
    kf = jnp.zeros((1, 1, cin, cout), k1.dtype).at[0, 0, pos_right, :].set(
        k1[0, 0])
    y = _conv(x, kf)
    y = jnp.maximum(_bn(y, params["b2_pw1bn"], stats["b2_pw1bn"]), 0)
    y = _conv(y, params["b2_dw"]["kernel"], stride=1, padding=1,
              groups=y.shape[-1])
    y = _bn(y, params["b2_dwbn"], stats["b2_dwbn"])
    y = _conv(y, params["b2_pw2"]["kernel"])
    y = jnp.maximum(_bn(y, params["b2_pw2bn"], stats["b2_pw2bn"]), 0)
    chunks = [x[..., a:b + 1] for a, b in runs]
    return jnp.concatenate(chunks + [y], axis=-1)


def folded_shufflenet_features(params: Dict, stats: Dict, x: jax.Array,
                               stage_out: Tuple[int, ...],
                               mean: Sequence[float], std: Sequence[float],
                               stem_out: Optional[jax.Array] = None
                               ) -> jax.Array:
    """Full eval-mode ShuffleNetV2 forward with all channel shuffles folded.

    Reads the SAME flax param/batch-stats pytrees as backbones.ShuffleNetV2
    (params/stats = the 'backbone' subtrees).  stem_out: optional
    pre-computed stem output (fused/packed stem opt-ins)."""
    plans, final_lam = plan_stages(tuple(stage_out))
    x = stem_out if stem_out is not None else _stem(params, stats, x,
                                                    mean, std)
    i = 0
    for s, reps in zip((2, 3, 4), _REPEATS):
        for j in range(reps):
            plan = plans[i]
            p, st = params[f"stage{s}_{j}"], stats[f"stage{s}_{j}"]
            if plan[0] == "s2":
                x = _unit_s2(p, st, x, plan[1])
            else:
                x = _unit_s1(p, st, x, plan[1], plan[2])
            i += 1
    x = _conv(x, params["conv5"]["kernel"][:, :, final_lam, :])
    return jnp.maximum(_bn(x, params["bn5"], stats["bn5"]), 0)


def folded_encode(variables: Dict, images: jax.Array, cfg,
                  stem_out: Optional[jax.Array] = None,
                  flatten: bool = True) -> jax.Array:
    """Drop-in replacement for SATEncoder.apply (eval) on the shufflenet
    family: folded backbone + 1x1 projection + encoder_size pool/upsample +
    FlattenShuffle, mirroring models/encoder.py::SATEncoder.__call__."""
    from ..models.backbones import BACKBONES
    from ..ops.image_ops import adaptive_avg_pool2d, bilinear_resize
    enc_p = variables["params"]["encoder"]
    enc_s = variables["state"]["batch_stats"]
    stage_out = tuple(BACKBONES[cfg.encoder_arch].keywords["stage_out"])
    x = folded_shufflenet_features(
        enc_p["backbone"], enc_s["backbone"], images, stage_out,
        tuple(cfg.mean), tuple(cfg.std), stem_out=stem_out)
    if "proj" in enc_p:
        x = _conv(x, enc_p["proj"]["kernel"])
        x = x + enc_p["proj"]["bias"].astype(x.dtype)
    if cfg.encoder_size is not None:
        h = x.shape[1]
        if cfg.encoder_size < h:
            x = adaptive_avg_pool2d(x, (cfg.encoder_size, cfg.encoder_size))
        elif cfg.encoder_size > h:
            x = bilinear_resize(x, (cfg.encoder_size, cfg.encoder_size))
    if not flatten:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)
