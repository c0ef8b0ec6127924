"""Encoder backbone zoo as Flax modules (NHWC, XLA-compiled convs).

TPU-native replacement for the reference's torchvision backbones
(reference: model.py:16-63 builds them; readme.md:99-105 lists the 24 supported
arch names).  Architectures follow the published papers/torchvision topologies
but are written NHWC-first for TPU; the classifier heads the reference strips
(model.py:29-41) are simply never built — every module returns the final
feature map (B, H, W, C).

Param naming is kept mechanical (stem/layerX/blockY/...) so torchvision
state_dicts can be imported offline via models/torch_import.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# torch BatchNorm defaults: eps=1e-5, momentum 0.1 (flax momentum = 0.9)
BN = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5)


def hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


# =========================================================================
# ResNet / ResNeXt / WideResNet (resnet18..152, resnext*, wide_resnet*)
# =========================================================================


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1,
                    use_bias=False, name="conv1")(x)
        y = BN(use_running_average=not self.train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = BN(use_running_average=not self.train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), (self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            identity = BN(use_running_average=not self.train, name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    train: bool = False

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = BN(use_running_average=not self.train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), (self.stride,) * 2, padding=1,
                    feature_group_count=self.groups, use_bias=False, name="conv2")(y)
        y = BN(use_running_average=not self.train, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = BN(use_running_average=not self.train, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            identity = BN(use_running_average=not self.train, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    bottleneck: bool = False
    groups: int = 1
    base_width: int = 64
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        if stem_out is not None:
            x = stem_out  # alternative stem formulation (models/packed_stem.py)
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(64, self.fold_norm[0], self.fold_norm[1],
                                   kernel_size=(7, 7), padding=3,
                                   name="conv1")(x)
            else:
                x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                            name="conv1")(x)
            x = BN(use_running_average=not self.train, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                if self.bottleneck:
                    x = Bottleneck(planes, stride, self.groups, self.base_width,
                                   self.train, name=f"layer{i+1}_{j}")(x)
                else:
                    x = BasicBlock(planes, stride, self.train,
                                   name=f"layer{i+1}_{j}")(x)
        return x


# =========================================================================
# ShuffleNetV2 (the reference's default encoder, shufflenet_v2_x0_5)
# =========================================================================


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class FoldedStemConv(nn.Module):
    """Stem conv with the encoder's input ``Normalize(mean, std)`` folded in.

    Normalize is a full-image bandwidth pass XLA can't fuse into a
    convolution (convs aren't fusion consumers on TPU) — profiled at ~7% of
    the b512 greedy-decode step.  Because the conv is linear, the normalize
    folds into the KERNEL exactly, including zero-padded borders:

        conv((x-m)/s, W)  ==  conv(x, W·(1/s))  -  conv(1_img, W·(m/s))

    where both convs use the same zero padding and ``1_img`` is a single
    ones-image — so the second term is a position-dependent bias map
    (borders see fewer real taps) computed from a (1, H, W, 3) conv, ~1/B of
    the batch cost.  Replaces the reference's Normalize-as-first-layer
    (reference: model.py:59-62) with zero image-sized work.  Parameter paths
    and inits match the ``nn.Conv`` it replaces so checkpoints and the
    torchvision converter are unaffected; equality with the
    normalize-then-conv path is pinned by
    tests/test_encoders.py::test_folded_stem_matches_normalize_path."""
    features: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 3, self.features), jnp.float32)
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        k = kernel.astype(dt)
        x = x.astype(dt)
        inv = jnp.asarray([1.0 / s for s in self.std], dt)
        mi = jnp.asarray([m / s for m, s in zip(self.mean, self.std)], dt)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        pad = [(self.padding, self.padding)] * 2
        conv = lambda lhs, w: jax.lax.conv_general_dilated(
            lhs, w, self.strides, pad, dimension_numbers=dn)
        ones = jnp.ones((1,) + x.shape[1:3] + (3,), dt)
        y = conv(x, k * inv[None, None, :, None]) \
            - conv(ones, k * mi[None, None, :, None])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class ShuffleUnit(nn.Module):
    out_ch: int
    stride: int
    train: bool = False

    @nn.compact
    def __call__(self, x):
        ra = not self.train
        branch_ch = self.out_ch // 2
        if self.stride == 1:
            left, right = jnp.split(x, 2, axis=-1)
        else:
            left = right = x
            # left branch: dw conv s2 + 1x1
            left = nn.Conv(x.shape[-1], (3, 3), (2, 2), padding=1,
                           feature_group_count=x.shape[-1], use_bias=False,
                           name="b1_dw")(left)
            left = BN(use_running_average=ra, name="b1_dwbn")(left)
            left = nn.Conv(branch_ch, (1, 1), use_bias=False, name="b1_pw")(left)
            left = BN(use_running_average=ra, name="b1_pwbn")(left)
            left = nn.relu(left)
        y = nn.Conv(branch_ch, (1, 1), use_bias=False, name="b2_pw1")(right)
        y = BN(use_running_average=ra, name="b2_pw1bn")(y)
        y = nn.relu(y)
        y = nn.Conv(branch_ch, (3, 3), (self.stride,) * 2, padding=1,
                    feature_group_count=branch_ch, use_bias=False, name="b2_dw")(y)
        y = BN(use_running_average=ra, name="b2_dwbn")(y)
        y = nn.Conv(branch_ch, (1, 1), use_bias=False, name="b2_pw2")(y)
        y = BN(use_running_average=ra, name="b2_pw2bn")(y)
        y = nn.relu(y)
        # shuffle(concat([l, y]), 2) IS the riffle interleave out[2i]=l[i],
        # out[2i+1]=y[i]; stack+reshape emits it in one pass instead of the
        # concat copy + reshape/swapaxes/reshape relayout pair the generic
        # channel_shuffle costs per unit (profiled ~0.8 ms/step @b512 decode).
        # Bit-exact by construction (tests/test_encoders.py pins it).
        b, h, w, c = left.shape
        return jnp.stack([left, y], axis=-1).reshape(b, h, w, 2 * c)


class ShuffleNetV2(nn.Module):
    stage_out: Sequence[int]   # (c2, c3, c4, conv5)
    train: bool = False
    # (mean, std) tuples -> the input Normalize is folded into conv1's kernel
    # (see FoldedStemConv) and the caller feeds RAW [0,1] images
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        ra = not self.train
        if stem_out is not None:
            # stem already computed by an alternative formulation
            # (models/packed_stem.py) — resume from the pooled feature map
            x = stem_out
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(24, self.fold_norm[0], self.fold_norm[1],
                                   name="conv1")(x)
            else:
                x = nn.Conv(24, (3, 3), (2, 2), padding=1, use_bias=False,
                            name="conv1")(x)
            x = BN(use_running_average=ra, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for s, (out_ch, repeats) in enumerate(zip(self.stage_out[:3], (4, 8, 4))):
            x = ShuffleUnit(out_ch, 2, self.train, name=f"stage{s+2}_0")(x)
            for j in range(repeats - 1):
                x = ShuffleUnit(out_ch, 1, self.train, name=f"stage{s+2}_{j+1}")(x)
        x = nn.Conv(self.stage_out[3], (1, 1), use_bias=False, name="conv5")(x)
        x = BN(use_running_average=ra, name="bn5")(x)
        return nn.relu(x)


# =========================================================================
# MobileNetV2 / MobileNetV3
# =========================================================================


def _make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand_ratio: float
    kernel: int = 3
    use_se: bool = False
    activation: Callable = jax.nn.relu6
    train: bool = False

    @nn.compact
    def __call__(self, x):
        ra = not self.train
        in_ch = x.shape[-1]
        hidden = _make_divisible(in_ch * self.expand_ratio) \
            if self.expand_ratio != 1 else in_ch
        use_res = self.stride == 1 and in_ch == self.out_ch
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, name="expand")(y)
            y = BN(use_running_average=ra, name="expand_bn")(y)
            y = self.activation(y)
        pad = (self.kernel - 1) // 2
        y = nn.Conv(hidden, (self.kernel,) * 2, (self.stride,) * 2, padding=pad,
                    feature_group_count=hidden, use_bias=False, name="dw")(y)
        y = BN(use_running_average=ra, name="dw_bn")(y)
        y = self.activation(y)
        if self.use_se:
            se_ch = _make_divisible(hidden // 4)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.Conv(se_ch, (1, 1), name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(hidden, (1, 1), name="se_fc2")(s)
            y = y * hsigmoid(s)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project")(y)
        y = BN(use_running_average=ra, name="project_bn")(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None
    # (expand, out, repeats, stride)
    settings: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        ra = not self.train
        if stem_out is not None:
            x = stem_out  # alternative stem formulation (models/packed_stem.py)
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(32, self.fold_norm[0], self.fold_norm[1],
                                   name="stem")(x)
            else:
                x = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False,
                            name="stem")(x)
            x = BN(use_running_average=ra, name="stem_bn")(x)
            x = jax.nn.relu6(x)
        idx = 0
        for t, ch, n, s in self.settings:
            for j in range(n):
                x = InvertedResidual(ch, s if j == 0 else 1, t, 3, False,
                                     jax.nn.relu6, self.train,
                                     name=f"block{idx}")(x)
                idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head")(x)
        x = BN(use_running_average=ra, name="head_bn")(x)
        return jax.nn.relu6(x)


# (kernel, expanded, out, SE, HS-activation, stride)
_MBV3_LARGE = (
    (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1))
_MBV3_SMALL = (
    (3, 16, 16, True, False, 2), (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1), (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1))


class MobileNetV3Block(nn.Module):
    kernel: int
    expanded: int
    out_ch: int
    use_se: bool
    use_hs: bool
    stride: int
    train: bool = False

    @nn.compact
    def __call__(self, x):
        ra = not self.train
        act = hswish if self.use_hs else nn.relu
        in_ch = x.shape[-1]
        use_res = self.stride == 1 and in_ch == self.out_ch
        y = x
        if self.expanded != in_ch:
            y = nn.Conv(self.expanded, (1, 1), use_bias=False, name="expand")(y)
            y = BN(use_running_average=ra, name="expand_bn")(y)
            y = act(y)
        pad = (self.kernel - 1) // 2
        y = nn.Conv(self.expanded, (self.kernel,) * 2, (self.stride,) * 2,
                    padding=pad, feature_group_count=self.expanded,
                    use_bias=False, name="dw")(y)
        y = BN(use_running_average=ra, name="dw_bn")(y)
        y = act(y)
        if self.use_se:
            se_ch = _make_divisible(self.expanded // 4)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.Conv(se_ch, (1, 1), name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(self.expanded, (1, 1), name="se_fc2")(s)
            y = y * hsigmoid(s)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project")(y)
        y = BN(use_running_average=ra, name="project_bn")(y)
        return x + y if use_res else y


class MobileNetV3(nn.Module):
    settings: Sequence[Tuple[int, int, int, bool, bool, int]]
    last_channels: int
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        ra = not self.train
        if stem_out is not None:
            x = stem_out  # alternative stem formulation (models/packed_stem.py)
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(16, self.fold_norm[0], self.fold_norm[1],
                                   name="stem")(x)
            else:
                x = nn.Conv(16, (3, 3), (2, 2), padding=1, use_bias=False,
                            name="stem")(x)
            x = BN(use_running_average=ra, name="stem_bn")(x)
            x = hswish(x)
        for i, (k, e, c, se, hs, s) in enumerate(self.settings):
            x = MobileNetV3Block(k, e, c, se, hs, s, self.train, name=f"block{i}")(x)
        x = nn.Conv(self.last_channels, (1, 1), use_bias=False, name="head")(x)
        x = BN(use_running_average=ra, name="head_bn")(x)
        return hswish(x)


# =========================================================================
# SqueezeNet
# =========================================================================


def _max_pool_ceil(x, window=3, stride=2):
    """torch MaxPool2d(ceil_mode=True): pad right/bottom so the last partial
    window is kept (squeezenet uses this; floor-mode loses a row at 1_0)."""
    out = lambda n: -(-(n - window) // stride) + 1
    pads = []
    for dim in (1, 2):
        n = x.shape[dim]
        pads.append((out(n) - 1) * stride + window - n)
    if any(pads):
        x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), (stride, stride))


class Fire(nn.Module):
    squeeze: int
    expand1: int
    expand3: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand1, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand3, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(nn.Module):
    version: str = "1_1"
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x):
        mp = _max_pool_ceil
        if self.version == "1_0":
            if self.fold_norm is not None:
                x = nn.relu(FoldedStemConv(
                    96, self.fold_norm[0], self.fold_norm[1],
                    kernel_size=(7, 7), padding=0, use_bias=True,
                    name="conv1")(x))
            else:
                x = nn.relu(nn.Conv(96, (7, 7), (2, 2), padding=0,
                                    name="conv1")(x))
            x = mp(x)
            x = Fire(16, 64, 64, name="fire2")(x)
            x = Fire(16, 64, 64, name="fire3")(x)
            x = Fire(32, 128, 128, name="fire4")(x)
            x = mp(x)
            x = Fire(32, 128, 128, name="fire5")(x)
            x = Fire(48, 192, 192, name="fire6")(x)
            x = Fire(48, 192, 192, name="fire7")(x)
            x = Fire(64, 256, 256, name="fire8")(x)
            x = mp(x)
            x = Fire(64, 256, 256, name="fire9")(x)
        else:
            if self.fold_norm is not None:
                x = nn.relu(FoldedStemConv(
                    64, self.fold_norm[0], self.fold_norm[1],
                    kernel_size=(3, 3), padding=0, use_bias=True,
                    name="conv1")(x))
            else:
                x = nn.relu(nn.Conv(64, (3, 3), (2, 2), padding=0,
                                    name="conv1")(x))
            x = mp(x)
            x = Fire(16, 64, 64, name="fire2")(x)
            x = Fire(16, 64, 64, name="fire3")(x)
            x = mp(x)
            x = Fire(32, 128, 128, name="fire4")(x)
            x = Fire(32, 128, 128, name="fire5")(x)
            x = mp(x)
            x = Fire(48, 192, 192, name="fire6")(x)
            x = Fire(48, 192, 192, name="fire7")(x)
            x = Fire(64, 256, 256, name="fire8")(x)
            x = Fire(64, 256, 256, name="fire9")(x)
        return x


# =========================================================================
# DenseNet
# =========================================================================


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4
    train: bool = False

    @nn.compact
    def __call__(self, x):
        ra = not self.train
        y = BN(use_running_average=ra, name="norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False, name="conv1")(y)
        y = BN(use_running_average=ra, name="norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth: int = 32
    init_features: int = 64
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        ra = not self.train
        if stem_out is not None:
            x = stem_out  # alternative stem formulation (models/packed_stem.py)
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(self.init_features, self.fold_norm[0],
                                   self.fold_norm[1], kernel_size=(7, 7),
                                   padding=3, name="conv0")(x)
            else:
                x = nn.Conv(self.init_features, (7, 7), (2, 2), padding=3,
                            use_bias=False, name="conv0")(x)
            x = BN(use_running_average=ra, name="norm0")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth, train=self.train,
                               name=f"dense{i+1}_{j}")(x)
            if i != len(self.block_config) - 1:
                x = BN(use_running_average=ra, name=f"trans{i+1}_norm")(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            name=f"trans{i+1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), (2, 2))
        # final norm (inside torchvision's `features`, kept — the reference's
        # children()[:-1] strip keeps it and skips the extra relu, model.py:34-35)
        return BN(use_running_average=ra, name="norm5")(x)


# =========================================================================
# MNASNet
# =========================================================================


def _round8(v: float) -> int:
    # torchvision _round_to_multiple_of(val, 8) with the 90% guard
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class MNASNet(nn.Module):
    alpha: float
    train: bool = False
    # (mean, std) -> input Normalize folded into the stem kernel
    fold_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, stem_out: Optional[jax.Array] = None):
        ra = not self.train
        depths = [_round8(d * self.alpha)
                  for d in (32, 16, 24, 40, 80, 96, 192, 320)]
        if stem_out is not None:
            x = stem_out  # alternative stem formulation (models/packed_stem.py)
        else:
            if self.fold_norm is not None:
                x = FoldedStemConv(depths[0], self.fold_norm[0],
                                   self.fold_norm[1], name="stem")(x)
            else:
                x = nn.Conv(depths[0], (3, 3), (2, 2), padding=1,
                            use_bias=False, name="stem")(x)
            x = BN(use_running_average=ra, name="stem_bn")(x)
            x = nn.relu(x)
        # separable: dw 3x3 + pw 1x1 -> depths[1]
        x = nn.Conv(depths[0], (3, 3), padding=1, feature_group_count=depths[0],
                    use_bias=False, name="sep_dw")(x)
        x = BN(use_running_average=ra, name="sep_dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(depths[1], (1, 1), use_bias=False, name="sep_pw")(x)
        x = BN(use_running_average=ra, name="sep_pw_bn")(x)
        cfgs = ((3, 3, depths[2], 3, 2), (3, 5, depths[3], 3, 2),
                (6, 5, depths[4], 3, 2), (6, 3, depths[5], 2, 1),
                (6, 5, depths[6], 4, 2), (6, 3, depths[7], 1, 1))
        idx = 0
        for t, k, ch, n, s in cfgs:
            for j in range(n):
                x = InvertedResidual(ch, s if j == 0 else 1, t, k, False,
                                     nn.relu, self.train, name=f"block{idx}")(x)
                idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head")(x)
        x = BN(use_running_average=ra, name="head_bn")(x)
        return nn.relu(x)


# =========================================================================
# Registry: the 24 reference arch names (readme.md:99-105)
# =========================================================================


BACKBONES: Dict[str, Callable[..., nn.Module]] = {
    "resnet18": partial(ResNet, stage_sizes=(2, 2, 2, 2)),
    "resnet34": partial(ResNet, stage_sizes=(3, 4, 6, 3)),
    "resnet50": partial(ResNet, stage_sizes=(3, 4, 6, 3), bottleneck=True),
    "resnet101": partial(ResNet, stage_sizes=(3, 4, 23, 3), bottleneck=True),
    "resnet152": partial(ResNet, stage_sizes=(3, 8, 36, 3), bottleneck=True),
    "resnext50_32x4d": partial(ResNet, stage_sizes=(3, 4, 6, 3), bottleneck=True,
                               groups=32, base_width=4),
    "resnext101_32x8d": partial(ResNet, stage_sizes=(3, 4, 23, 3), bottleneck=True,
                                groups=32, base_width=8),
    "wide_resnet50_2": partial(ResNet, stage_sizes=(3, 4, 6, 3), bottleneck=True,
                               base_width=128),
    "wide_resnet101_2": partial(ResNet, stage_sizes=(3, 4, 23, 3), bottleneck=True,
                                base_width=128),
    "squeezenet1_0": partial(SqueezeNet, version="1_0"),
    "squeezenet1_1": partial(SqueezeNet, version="1_1"),
    "densenet121": partial(DenseNet, block_config=(6, 12, 24, 16)),
    "densenet169": partial(DenseNet, block_config=(6, 12, 32, 32)),
    "densenet201": partial(DenseNet, block_config=(6, 12, 48, 32)),
    "densenet161": partial(DenseNet, block_config=(6, 12, 36, 24), growth=48,
                           init_features=96),
    "shufflenet_v2_x0_5": partial(ShuffleNetV2, stage_out=(48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": partial(ShuffleNetV2, stage_out=(116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": partial(ShuffleNetV2, stage_out=(176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": partial(ShuffleNetV2, stage_out=(244, 488, 976, 2048)),
    "mobilenet_v2": MobileNetV2,
    "mobilenet_v3_large": partial(MobileNetV3, settings=_MBV3_LARGE,
                                  last_channels=960),
    "mobilenet_v3_small": partial(MobileNetV3, settings=_MBV3_SMALL,
                                  last_channels=576),
    "mnasnet0_5": partial(MNASNet, alpha=0.5),
    "mnasnet0_75": partial(MNASNet, alpha=0.75),
    "mnasnet1_0": partial(MNASNet, alpha=1.0),
    "mnasnet1_3": partial(MNASNet, alpha=1.3),
}

# Families whose stem accepts fold_norm=(mean, std) — the encoder then skips
# its Normalize pass and feeds raw images (see FoldedStemConv)
# Every family folds the input Normalize into its stem conv
FOLD_NORM_ARCHS = frozenset(BACKBONES)
