"""Offline torchvision -> Flax weight conversion.

The reference's quality numbers all come from imagenet-pretrained torchvision
backbones (reference: model.py:20 ``pretrained=args.pretrained``;
readme.md:195-203 shows pretrained >> scratch).  This module converts a saved
torchvision ``state_dict`` (a dict of tensors, loadable with torch on CPU, or
an .npz with the same keys) into this framework's Flax param/batch_stats trees.

Conventions:
  torch conv weight (O, I/g, kH, kW)  -> flax kernel (kH, kW, I/g, O)
  torch BN weight/bias/running_mean/var -> flax scale/bias + batch_stats mean/var
Layouts follow torchvision's published state_dict key naming per family.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    w = np.asarray(w)
    return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _take(sd: Dict[str, Any], key: str) -> np.ndarray:
    return np.asarray(sd.pop(key))


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    p = {"scale": _take(sd, f"{prefix}.weight"),
         "bias": _take(sd, f"{prefix}.bias")}
    s = {"mean": _take(sd, f"{prefix}.running_mean"),
         "var": _take(sd, f"{prefix}.running_var")}
    sd.pop(f"{prefix}.num_batches_tracked", None)
    return p, s


def _conv_entry(sd, key) -> Dict:
    p = {"kernel": _conv(_take(sd, f"{key}.weight"))}
    if f"{key}.bias" in sd:
        p["bias"] = _take(sd, f"{key}.bias")
    return p


class _Tree:
    """Accumulates params + batch_stats keyed by flax module path."""

    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def conv(self, flax_name: str, sd, torch_key: str):
        self.params[flax_name] = _conv_entry(sd, torch_key)

    def bn(self, flax_name: str, sd, torch_key: str):
        p, s = _bn(sd, torch_key)
        self.params[flax_name] = p
        self.stats[flax_name] = s


# ---------------------------------------------------------------------------
# per-family converters: state_dict -> (params, batch_stats) for the backbone
# ---------------------------------------------------------------------------


def convert_resnet(sd: Dict[str, Any], stage_sizes, bottleneck: bool
                   ) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("conv1", sd, "conv1")
    t.bn("bn1", sd, "bn1")
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            tp = f"layer{i+1}.{j}"
            fp = f"layer{i+1}_{j}"
            blk = _Tree()
            n_convs = 3 if bottleneck else 2
            for k in range(1, n_convs + 1):
                blk.conv(f"conv{k}", sd, f"{tp}.conv{k}")
                blk.bn(f"bn{k}", sd, f"{tp}.bn{k}")
            if f"{tp}.downsample.0.weight" in sd:
                blk.conv("down_conv", sd, f"{tp}.downsample.0")
                blk.bn("down_bn", sd, f"{tp}.downsample.1")
            t.params[fp] = blk.params
            t.stats[fp] = blk.stats
    return t.params, t.stats


def convert_shufflenet(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("conv1", sd, "conv1.0")
    t.bn("bn1", sd, "conv1.1")
    for s, repeats in zip((2, 3, 4), (4, 8, 4)):
        for j in range(repeats):
            tp = f"stage{s}.{j}"
            fp = f"stage{s}_{j}"
            blk = _Tree()
            if j == 0:  # stride unit has branch1
                blk.conv("b1_dw", sd, f"{tp}.branch1.0")
                blk.bn("b1_dwbn", sd, f"{tp}.branch1.1")
                blk.conv("b1_pw", sd, f"{tp}.branch1.2")
                blk.bn("b1_pwbn", sd, f"{tp}.branch1.3")
            blk.conv("b2_pw1", sd, f"{tp}.branch2.0")
            blk.bn("b2_pw1bn", sd, f"{tp}.branch2.1")
            blk.conv("b2_dw", sd, f"{tp}.branch2.3")
            blk.bn("b2_dwbn", sd, f"{tp}.branch2.4")
            blk.conv("b2_pw2", sd, f"{tp}.branch2.5")
            blk.bn("b2_pw2bn", sd, f"{tp}.branch2.6")
            t.params[fp] = blk.params
            t.stats[fp] = blk.stats
    t.conv("conv5", sd, "conv5.0")
    t.bn("bn5", sd, "conv5.1")
    return t.params, t.stats


def convert_mobilenet_v2(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("stem", sd, "features.0.0")
    t.bn("stem_bn", sd, "features.0.1")
    idx = 0
    for feat in range(1, 18):
        tp = f"features.{feat}.conv"
        fp = f"block{idx}"
        blk = _Tree()
        if f"{tp}.0.0.weight" in sd and f"{tp}.1.0.weight" in sd:
            # expand(0) + dw(1) + project(2,3)
            blk.conv("expand", sd, f"{tp}.0.0")
            blk.bn("expand_bn", sd, f"{tp}.0.1")
            blk.conv("dw", sd, f"{tp}.1.0")
            blk.bn("dw_bn", sd, f"{tp}.1.1")
            blk.conv("project", sd, f"{tp}.2")
            blk.bn("project_bn", sd, f"{tp}.3")
        else:
            # first block (t=1): dw(0) + project(1,2)
            blk.conv("dw", sd, f"{tp}.0.0")
            blk.bn("dw_bn", sd, f"{tp}.0.1")
            blk.conv("project", sd, f"{tp}.1")
            blk.bn("project_bn", sd, f"{tp}.2")
        t.params[fp] = blk.params
        t.stats[fp] = blk.stats
        idx += 1
    t.conv("head", sd, "features.18.0")
    t.bn("head_bn", sd, "features.18.1")
    return t.params, t.stats


def convert_mobilenet_v3(sd: Dict[str, Any], n_blocks: int) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("stem", sd, "features.0.0")
    t.bn("stem_bn", sd, "features.0.1")
    for i in range(n_blocks):
        tp = f"features.{i+1}.block"
        fp = f"block{i}"
        blk = _Tree()
        # torchvision block layout: [expand?][dw][se?][project]; each
        # Conv2dNormActivation is .0 (conv) + .1 (bn)
        pos = 0
        # detect expand by counting conv layers present
        sub_keys = [k for k in sd if k.startswith(tp + ".")]
        n_sub = 1 + max(int(k[len(tp) + 1:].split(".")[0]) for k in sub_keys)
        has_se = any(".fc1." in k for k in sub_keys)
        expected = 2 + (1 if has_se else 0)
        has_expand = n_sub > expected
        if has_expand:
            blk.conv("expand", sd, f"{tp}.{pos}.0")
            blk.bn("expand_bn", sd, f"{tp}.{pos}.1")
            pos += 1
        blk.conv("dw", sd, f"{tp}.{pos}.0")
        blk.bn("dw_bn", sd, f"{tp}.{pos}.1")
        pos += 1
        if has_se:
            blk.conv("se_fc1", sd, f"{tp}.{pos}.fc1")
            blk.conv("se_fc2", sd, f"{tp}.{pos}.fc2")
            pos += 1
        blk.conv("project", sd, f"{tp}.{pos}.0")
        blk.bn("project_bn", sd, f"{tp}.{pos}.1")
        t.params[fp] = blk.params
        t.stats[fp] = blk.stats
    tp = f"features.{n_blocks+1}"
    t.conv("head", sd, f"{tp}.0")
    t.bn("head_bn", sd, f"{tp}.1")
    return t.params, t.stats


def convert_squeezenet(sd: Dict[str, Any], version: str) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("conv1", sd, "features.0")
    fire_feats = ((3, 4, 5, 7, 8, 9, 10, 12) if version == "1_0"
                  else (3, 4, 6, 7, 9, 10, 11, 12))
    for n, feat in enumerate(fire_feats, start=2):
        tp = f"features.{feat}"
        fp = f"fire{n}"
        blk = _Tree()
        blk.conv("squeeze", sd, f"{tp}.squeeze")
        blk.conv("expand1x1", sd, f"{tp}.expand1x1")
        blk.conv("expand3x3", sd, f"{tp}.expand3x3")
        t.params[fp] = blk.params
    return t.params, t.stats


def convert_densenet(sd: Dict[str, Any], block_config) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("conv0", sd, "features.conv0")
    t.bn("norm0", sd, "features.norm0")
    for i, n_layers in enumerate(block_config):
        for j in range(n_layers):
            tp = f"features.denseblock{i+1}.denselayer{j+1}"
            fp = f"dense{i+1}_{j}"
            blk = _Tree()
            blk.bn("norm1", sd, f"{tp}.norm1")
            blk.conv("conv1", sd, f"{tp}.conv1")
            blk.bn("norm2", sd, f"{tp}.norm2")
            blk.conv("conv2", sd, f"{tp}.conv2")
            t.params[fp] = blk.params
            t.stats[fp] = blk.stats
        if i != len(block_config) - 1:
            t.bn(f"trans{i+1}_norm", sd, f"features.transition{i+1}.norm")
            t.conv(f"trans{i+1}_conv", sd, f"features.transition{i+1}.conv")
    t.bn("norm5", sd, "features.norm5")
    return t.params, t.stats


def convert_mnasnet(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    t = _Tree()
    t.conv("stem", sd, "layers.0")
    t.bn("stem_bn", sd, "layers.1")
    t.conv("sep_dw", sd, "layers.3")
    t.bn("sep_dw_bn", sd, "layers.4")
    t.conv("sep_pw", sd, "layers.6")
    t.bn("sep_pw_bn", sd, "layers.7")
    idx = 0
    for stack, n in zip(range(8, 14), (3, 3, 3, 2, 4, 1)):
        for j in range(n):
            tp = f"layers.{stack}.{j}.layers"
            fp = f"block{idx}"
            blk = _Tree()
            blk.conv("expand", sd, f"{tp}.0")
            blk.bn("expand_bn", sd, f"{tp}.1")
            blk.conv("dw", sd, f"{tp}.3")
            blk.bn("dw_bn", sd, f"{tp}.4")
            blk.conv("project", sd, f"{tp}.6")
            blk.bn("project_bn", sd, f"{tp}.7")
            t.params[fp] = blk.params
            t.stats[fp] = blk.stats
            idx += 1
    t.conv("head", sd, "layers.14")
    t.bn("head_bn", sd, "layers.15")
    return t.params, t.stats


# ---------------------------------------------------------------------------


_MBV3_N = {"mobilenet_v3_large": 15, "mobilenet_v3_small": 11}
_RESNET = {
    "resnet18": ((2, 2, 2, 2), False), "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True), "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
    "resnext50_32x4d": ((3, 4, 6, 3), True),
    "resnext101_32x8d": ((3, 4, 23, 3), True),
    "wide_resnet50_2": ((3, 4, 6, 3), True),
    "wide_resnet101_2": ((3, 4, 23, 3), True),
}
_DENSENET = {"densenet121": (6, 12, 24, 16), "densenet169": (6, 12, 32, 32),
             "densenet201": (6, 12, 48, 32), "densenet161": (6, 12, 36, 24)}


def convert_backbone(arch: str, state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision state_dict -> (backbone params, backbone batch_stats).
    Classifier-head keys are ignored (the reference strips them,
    model.py:29-41)."""
    sd = {k: v for k, v in state_dict.items()
          if not k.startswith(("fc.", "classifier."))}
    if arch in _RESNET:
        stages, bottleneck = _RESNET[arch]
        return convert_resnet(sd, stages, bottleneck)
    if arch.startswith("shufflenet_v2"):
        return convert_shufflenet(sd)
    if arch == "mobilenet_v2":
        return convert_mobilenet_v2(sd)
    if arch in _MBV3_N:
        return convert_mobilenet_v3(sd, _MBV3_N[arch])
    if arch.startswith("squeezenet"):
        return convert_squeezenet(sd, arch.split("squeezenet")[1])
    if arch in _DENSENET:
        return convert_densenet(sd, _DENSENET[arch])
    if arch.startswith("mnasnet"):
        return convert_mnasnet(sd)
    raise ValueError(f"no converter for {arch}")


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torchvision state_dict saved as .pt/.pth (torch) or .npz."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.numpy() for k, v in obj.items()}


def import_pretrained(arch: str, path: str, variables: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Merge converted backbone weights into a freshly-initialized variables
    tree (params + batch_stats), shape-checked leaf by leaf."""
    import jax

    params, stats = convert_backbone(arch, load_state_dict(path))

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                assert k in dst, f"missing module {path}/{k} in target"
                merge(dst[k], v, f"{path}/{k}")
            else:
                assert k in dst, f"missing leaf {path}/{k}"
                assert dst[k].shape == v.shape, \
                    f"shape mismatch at {path}/{k}: {dst[k].shape} vs {v.shape}"
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    out = jax.device_get(variables)
    merge(out["params"]["encoder"]["backbone"], params)
    if stats:  # BatchNorm-free archs (squeezenet) have no batch_stats tree
        # layout matches SATModel.create: state.batch_stats.backbone.*
        merge(out["state"]["batch_stats"]["backbone"], stats)
    return out
