"""Numeric torch-replay validation of every backbone weight converter
(VERDICT r1 next-round item #3).

For each of the 24 reference arch names (reference: readme.md:99-105,
model.py:16-63) we build a torch module replicating torchvision's EXACT
state_dict key layout and published topology, randomize all params + BN
running stats, run an image through the torch forward, convert the
state_dict with models/torch_import.convert_backbone, and assert the Flax
backbone's activations match — catching silent transpose slips, BN
scale/bias or mean/var swaps, gate-order errors, group/depthwise layout
bugs, ceil-mode pools, SE-block wiring, and channel-shuffle semantics that
key/shape-only checks (test_torch_import.py) cannot see.

The torch replicas are written from torchvision's published architecture
definitions, independently of sat_tpu/models/backbones.py (double-entry
bookkeeping: a shared misreading would need to be made twice in two
frameworks' idioms to slip through).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sat_tpu.models.backbones import BACKBONES  # noqa: E402
from sat_tpu.models.torch_import import convert_backbone  # noqa: E402

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


# ---------------------------------------------------------------------------
# torchvision building blocks (state_dict-key-compatible)
# ---------------------------------------------------------------------------


class ConvBNAct(nn.Sequential):
    """torchvision Conv2dNormActivation: .0 conv, .1 bn (+ paramless act)."""

    def __init__(self, inp, out, k=3, s=1, groups=1, act=nn.ReLU):
        layers = [nn.Conv2d(inp, out, k, s, (k - 1) // 2, groups=groups,
                            bias=False), nn.BatchNorm2d(out)]
        if act is not None:
            layers.append(act())
        super().__init__(*layers)


# ----------------------------- ResNet family -------------------------------


class TVBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + identity)


class TVBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        out = planes * 4
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + identity)


class TVResNet(nn.Module):
    def __init__(self, block, layers, groups=1, base_width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, n in enumerate(layers):
            planes = 64 * (2 ** i)
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                if block is TVBottleneck:
                    blocks.append(block(inplanes, planes, stride, groups,
                                        base_width))
                else:
                    blocks.append(block(inplanes, planes, stride))
                inplanes = planes * block.expansion
            setattr(self, f"layer{i+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


# --------------------------- ShuffleNetV2 ----------------------------------


def tv_channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    return (x.view(b, groups, c // groups, h, w).transpose(1, 2)
            .reshape(b, c, h, w))


class TVShuffleUnit(nn.Module):
    def __init__(self, inp, out, stride):
        super().__init__()
        self.stride = stride
        branch_ch = out // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, branch_ch, 1, bias=False),
                nn.BatchNorm2d(branch_ch), nn.ReLU())
        else:
            self.branch1 = nn.Sequential()
        b2_in = inp if stride > 1 else branch_ch
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, branch_ch, 1, bias=False),
            nn.BatchNorm2d(branch_ch), nn.ReLU(),
            nn.Conv2d(branch_ch, branch_ch, 3, stride, 1, groups=branch_ch,
                      bias=False),
            nn.BatchNorm2d(branch_ch),
            nn.Conv2d(branch_ch, branch_ch, 1, bias=False),
            nn.BatchNorm2d(branch_ch), nn.ReLU())

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat([x1, self.branch2(x2)], dim=1)
        else:
            out = torch.cat([self.branch1(x), self.branch2(x)], dim=1)
        return tv_channel_shuffle(out, 2)


class TVShuffleNetV2(nn.Module):
    def __init__(self, stages_out):  # (c2, c3, c4, conv5)
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(3, 24, 3, 2, 1, bias=False),
                                   nn.BatchNorm2d(24), nn.ReLU())
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inp = 24
        for s, (out, repeats) in enumerate(zip(stages_out[:3], (4, 8, 4))):
            units = [TVShuffleUnit(inp, out, 2)]
            units += [TVShuffleUnit(out, out, 1) for _ in range(repeats - 1)]
            setattr(self, f"stage{s+2}", nn.Sequential(*units))
            inp = out
        self.conv5 = nn.Sequential(nn.Conv2d(inp, stages_out[3], 1, bias=False),
                                   nn.BatchNorm2d(stages_out[3]), nn.ReLU())

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        for s in (2, 3, 4):
            x = getattr(self, f"stage{s}")(x)
        return self.conv5(x)


# --------------------------- MobileNetV2 -----------------------------------


class TVInvertedResidualV2(nn.Module):
    def __init__(self, inp, out, stride, expand):
        super().__init__()
        hidden = int(round(inp * expand))
        self.use_res = stride == 1 and inp == out
        layers = []
        if expand != 1:
            layers.append(ConvBNAct(inp, hidden, 1, act=nn.ReLU6))
        layers += [ConvBNAct(hidden, hidden, 3, stride, groups=hidden,
                             act=nn.ReLU6),
                   nn.Conv2d(hidden, out, 1, bias=False),
                   nn.BatchNorm2d(out)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TVMobileNetV2(nn.Module):
    SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self):
        super().__init__()
        feats = [ConvBNAct(3, 32, 3, 2, act=nn.ReLU6)]
        inp = 32
        for t, c, n, s in self.SETTINGS:
            for j in range(n):
                feats.append(TVInvertedResidualV2(inp, c, s if j == 0 else 1, t))
                inp = c
        feats.append(ConvBNAct(inp, 1280, 1, act=nn.ReLU6))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


# --------------------------- MobileNetV3 -----------------------------------


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class TVSqueezeExcitation(nn.Module):
    def __init__(self, ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = F.hardsigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class TVMBV3Block(nn.Module):
    def __init__(self, inp, kernel, expanded, out, use_se, use_hs, stride):
        super().__init__()
        act = nn.Hardswish if use_hs else nn.ReLU
        self.use_res = stride == 1 and inp == out
        layers = []
        if expanded != inp:
            layers.append(ConvBNAct(inp, expanded, 1, act=act))
        layers.append(ConvBNAct(expanded, expanded, kernel, stride,
                                groups=expanded, act=act))
        if use_se:
            layers.append(TVSqueezeExcitation(expanded,
                                              _make_divisible(expanded // 4)))
        layers.append(ConvBNAct(expanded, out, 1, act=None))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


# (kernel, expanded, out, SE, HS, stride) — torchvision inverted residual cfgs
MBV3_LARGE = (
    (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1))
MBV3_SMALL = (
    (3, 16, 16, True, False, 2), (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1), (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1))


class TVMobileNetV3(nn.Module):
    def __init__(self, settings, last_channels):
        super().__init__()
        feats = [ConvBNAct(3, 16, 3, 2, act=nn.Hardswish)]
        inp = 16
        for k, e, c, se, hs, s in settings:
            feats.append(TVMBV3Block(inp, k, e, c, se, hs, s))
            inp = c
        feats.append(ConvBNAct(inp, last_channels, 1, act=nn.Hardswish))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


# ----------------------------- SqueezeNet ----------------------------------


class TVFire(nn.Module):
    def __init__(self, inp, squeeze, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(inp, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, e1, 1)
        self.expand3x3 = nn.Conv2d(squeeze, e3, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], dim=1)


class TVSqueezeNet(nn.Module):
    def __init__(self, version):
        super().__init__()
        mp = lambda: nn.MaxPool2d(3, 2, ceil_mode=True)
        if version == "1_0":
            self.features = nn.Sequential(
                nn.Conv2d(3, 96, 7, 2), nn.ReLU(), mp(),
                TVFire(96, 16, 64, 64), TVFire(128, 16, 64, 64),
                TVFire(128, 32, 128, 128), mp(),
                TVFire(256, 32, 128, 128), TVFire(256, 48, 192, 192),
                TVFire(384, 48, 192, 192), TVFire(384, 64, 256, 256), mp(),
                TVFire(512, 64, 256, 256))
        else:
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 3, 2), nn.ReLU(), mp(),
                TVFire(64, 16, 64, 64), TVFire(128, 16, 64, 64), mp(),
                TVFire(128, 32, 128, 128), TVFire(256, 32, 128, 128), mp(),
                TVFire(256, 48, 192, 192), TVFire(384, 48, 192, 192),
                TVFire(384, 64, 256, 256), TVFire(512, 64, 256, 256))

    def forward(self, x):
        return self.features(x)


# ------------------------------ DenseNet -----------------------------------


class TVDenseLayer(nn.Module):
    def __init__(self, inp, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(inp)
        self.conv1 = nn.Conv2d(inp, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], dim=1)


class TVDenseBlock(nn.Module):
    def __init__(self, inp, n_layers, growth):
        super().__init__()
        for j in range(n_layers):
            self.add_module(f"denselayer{j+1}",
                            TVDenseLayer(inp + j * growth, growth))
        self.n_layers = n_layers

    def forward(self, x):
        for j in range(self.n_layers):
            x = getattr(self, f"denselayer{j+1}")(x)
        return x


class TVDenseNet(nn.Module):
    def __init__(self, block_config, growth=32, init_features=64):
        super().__init__()
        od = OrderedDict()
        od["conv0"] = nn.Conv2d(3, init_features, 7, 2, 3, bias=False)
        od["norm0"] = nn.BatchNorm2d(init_features)
        od["relu0"] = nn.ReLU()
        od["pool0"] = nn.MaxPool2d(3, 2, 1)
        ch = init_features
        for i, n in enumerate(block_config):
            od[f"denseblock{i+1}"] = TVDenseBlock(ch, n, growth)
            ch += n * growth
            if i != len(block_config) - 1:
                od[f"transition{i+1}"] = nn.Sequential(OrderedDict([
                    ("norm", nn.BatchNorm2d(ch)), ("relu", nn.ReLU()),
                    ("conv", nn.Conv2d(ch, ch // 2, 1, bias=False)),
                    ("pool", nn.AvgPool2d(2, 2))]))
                ch //= 2
        od["norm5"] = nn.BatchNorm2d(ch)
        self.features = nn.Sequential(od)

    def forward(self, x):
        # reference strip keeps `features` (ends at norm5, no final relu —
        # model.py:34-35)
        return self.features(x)


# ------------------------------ MNASNet ------------------------------------


def _round8(v):
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class TVMNInvertedResidual(nn.Module):
    def __init__(self, inp, out, kernel, stride, expand):
        super().__init__()
        mid = inp * expand
        self.apply_residual = inp == out and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(inp, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.ReLU(),
            nn.Conv2d(mid, mid, kernel, stride, kernel // 2, groups=mid,
                      bias=False), nn.BatchNorm2d(mid), nn.ReLU(),
            nn.Conv2d(mid, out, 1, bias=False), nn.BatchNorm2d(out))

    def forward(self, x):
        return x + self.layers(x) if self.apply_residual else self.layers(x)


class TVMNASNet(nn.Module):
    def __init__(self, alpha):
        super().__init__()
        d = [_round8(x * alpha) for x in (32, 16, 24, 40, 80, 96, 192, 320)]
        layers = [
            nn.Conv2d(3, d[0], 3, 2, 1, bias=False), nn.BatchNorm2d(d[0]),
            nn.ReLU(),
            nn.Conv2d(d[0], d[0], 3, 1, 1, groups=d[0], bias=False),
            nn.BatchNorm2d(d[0]), nn.ReLU(),
            nn.Conv2d(d[0], d[1], 1, bias=False), nn.BatchNorm2d(d[1])]
        cfgs = ((d[1], d[2], 3, 2, 3, 3), (d[2], d[3], 5, 2, 3, 3),
                (d[3], d[4], 5, 2, 6, 3), (d[4], d[5], 3, 1, 6, 2),
                (d[5], d[6], 5, 2, 6, 4), (d[6], d[7], 3, 1, 6, 1))
        for inp, out, k, s, t, n in cfgs:
            stack = [TVMNInvertedResidual(inp, out, k, s, t)]
            stack += [TVMNInvertedResidual(out, out, k, 1, t)
                      for _ in range(n - 1)]
            layers.append(nn.Sequential(*stack))
        layers += [nn.Conv2d(d[7], 1280, 1, bias=False),
                   nn.BatchNorm2d(1280), nn.ReLU()]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


TV_BUILDERS = {
    "resnet18": lambda: TVResNet(TVBasicBlock, (2, 2, 2, 2)),
    "resnet34": lambda: TVResNet(TVBasicBlock, (3, 4, 6, 3)),
    "resnet50": lambda: TVResNet(TVBottleneck, (3, 4, 6, 3)),
    "resnet101": lambda: TVResNet(TVBottleneck, (3, 4, 23, 3)),
    "resnet152": lambda: TVResNet(TVBottleneck, (3, 8, 36, 3)),
    "resnext50_32x4d": lambda: TVResNet(TVBottleneck, (3, 4, 6, 3),
                                        groups=32, base_width=4),
    "resnext101_32x8d": lambda: TVResNet(TVBottleneck, (3, 4, 23, 3),
                                         groups=32, base_width=8),
    "wide_resnet50_2": lambda: TVResNet(TVBottleneck, (3, 4, 6, 3),
                                        base_width=128),
    "wide_resnet101_2": lambda: TVResNet(TVBottleneck, (3, 4, 23, 3),
                                         base_width=128),
    "shufflenet_v2_x0_5": lambda: TVShuffleNetV2((48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": lambda: TVShuffleNetV2((116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": lambda: TVShuffleNetV2((176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": lambda: TVShuffleNetV2((244, 488, 976, 2048)),
    "mobilenet_v2": TVMobileNetV2,
    "mobilenet_v3_large": lambda: TVMobileNetV3(MBV3_LARGE, 960),
    "mobilenet_v3_small": lambda: TVMobileNetV3(MBV3_SMALL, 576),
    "squeezenet1_0": lambda: TVSqueezeNet("1_0"),
    "squeezenet1_1": lambda: TVSqueezeNet("1_1"),
    "densenet121": lambda: TVDenseNet((6, 12, 24, 16)),
    "densenet169": lambda: TVDenseNet((6, 12, 32, 32)),
    "densenet201": lambda: TVDenseNet((6, 12, 48, 32)),
    "densenet161": lambda: TVDenseNet((6, 12, 36, 24), growth=48,
                                      init_features=96),
    "mnasnet0_5": lambda: TVMNASNet(0.5),
    "mnasnet0_75": lambda: TVMNASNet(0.75),
    "mnasnet1_0": lambda: TVMNASNet(1.0),
    "mnasnet1_3": lambda: TVMNASNet(1.3),
}


def randomize(model: nn.Module, seed: int):
    """Random weights AND random BN running stats (catches mean/var swaps —
    fresh-init stats of mean=0/var=1 would hide them)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            m.weight.data.normal_(0, m.weight.data.std().item() or 0.05,
                                  generator=g)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.05, generator=g)
        elif isinstance(m, nn.BatchNorm2d):
            m.weight.data.uniform_(0.5, 1.5, generator=g)
            m.bias.data.normal_(0, 0.1, generator=g)
            m.running_mean.normal_(0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.mark.parametrize("arch", sorted(TV_BUILDERS))
def test_converted_backbone_matches_torch_forward(arch):
    tv = TV_BUILDERS[arch]()
    randomize(tv, seed=abs(hash(arch)) % (2 ** 31))
    tv.eval()

    x = torch.from_numpy(
        np.random.default_rng(0).normal(size=(2, 3, 64, 64))
        .astype(np.float32))
    with torch.no_grad():
        want = tv(x).numpy().transpose(0, 2, 3, 1)      # NCHW -> NHWC

    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = convert_backbone(arch, sd)

    flax_model = BACKBONES[arch](train=False)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    got = np.asarray(flax_model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(float(np.abs(want).max()), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=1e-3)
