"""Import a reference PyTorch-Lightning SAT checkpoint into this framework.

A reference user's deployment artifact is a Lightning ``.ckpt`` holding the
full hparams (including the vocabulary) and the module state_dict (reference:
model.py:142 save_hyperparameters; SURVEY.md §3.3).  This module converts that
artifact into a SAT-TPU (config, variables) pair so existing trained models
decode in this framework unchanged — the migration path for reference users,
and the mechanism for BLEU-parity checks against shipped checkpoints.

Decoder mapping (torch Linear stores (out, in); we store (in, out)):
  embedding.weight                 -> decoder.embedding
  init_lstm.factorize / .init     -> init_factorize / init_proj
  attention.encoder_att/.decoder_att/.f_att -> att_enc / att_dec / f_att
  beta.0                           -> beta
  lstm.weight_ih_l{k}/hh + biases  -> lstm.layer_{k} (same i,f,g,o gate order)
  output.hidden/.context/.output   -> out_hidden / out_context / out_proj

Encoder mapping: the reference encoder is ``nn.Sequential(Normalize,
*backbone_children[, proj_conv])`` (model.py:59-62); we rewrite the
``encoder.<idx>.*`` keys back to torchvision's key layout per family and reuse
models/torch_import.py's converters.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import SATConfig
from .torch_import import convert_backbone

# family -> list of (sequential child index after Normalize, torchvision prefix)
_CHILD_MAPS = {
    "resnet": [("1", "conv1"), ("2", "bn1"), ("5", "layer1"), ("6", "layer2"),
               ("7", "layer3"), ("8", "layer4")],
    "shufflenet": [("1", "conv1"), ("3", "stage2"), ("4", "stage3"),
                   ("5", "stage4"), ("6", "conv5")],
    "single_features": [("1", "features")],   # squeezenet/densenet/mobilenet_v2/v3
    "mnasnet": [("1", "layers")],
}


def _family(arch: str) -> Tuple[str, int]:
    """Returns (child-map key, n_backbone_children incl. skipped non-param ones)."""
    if "resnet" in arch or "resnext" in arch:
        return "resnet", 9
    if "shufflenet" in arch:
        return "shufflenet", 7
    if "mnasnet" in arch:
        return "mnasnet", 2
    return "single_features", 2


def split_reference_state_dict(state_dict: Dict[str, Any], arch: str):
    """Split a reference SAT state_dict into (torchvision-keyed encoder sd,
    optional 1x1 proj conv sd, decoder sd)."""
    fam, n_children = _family(arch)
    enc_sd, dec_sd, proj = {}, {}, {}
    idx_map = dict(_CHILD_MAPS[fam])
    max_idx = max(int(i) for i in idx_map)
    for k, v in state_dict.items():
        v = np.asarray(v)
        if k.startswith("encoder."):
            rest = k[len("encoder."):]
            idx, sub = rest.split(".", 1)
            if idx in idx_map:
                enc_sd[f"{idx_map[idx]}.{sub}"] = v
            elif int(idx) > max_idx:
                proj[sub] = v             # appended encoder_dim 1x1 conv
        else:
            dec_sd[k] = v
    return enc_sd, proj, dec_sd


def _lin(dec_sd, key, bias=True):
    p = {"w": np.asarray(dec_sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in dec_sd:
        p["b"] = np.asarray(dec_sd[f"{key}.bias"])
    return p


def convert_decoder(dec_sd: Dict[str, Any], cfg: SATConfig) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "embedding": np.asarray(dec_sd["embedding.weight"]),
        "init_factorize": _lin(dec_sd, "init_lstm.factorize"),
        "init_proj": _lin(dec_sd, "init_lstm.init"),
        "att_enc": _lin(dec_sd, "attention.encoder_att", bias=False),
        "att_dec": _lin(dec_sd, "attention.decoder_att", bias=False),
        "f_att": _lin(dec_sd, "attention.f_att", bias=False),
        "beta": _lin(dec_sd, "beta.0"),
        "out_hidden": _lin(dec_sd, "output.hidden", bias=False),
    }
    lstm = {}
    for l in range(cfg.decoder_layers):
        lstm[f"layer_{l}"] = {
            "w_ih": np.asarray(dec_sd[f"lstm.weight_ih_l{l}"]).T,
            "w_hh": np.asarray(dec_sd[f"lstm.weight_hh_l{l}"]).T,
            "b_ih": np.asarray(dec_sd[f"lstm.bias_ih_l{l}"]),
            "b_hh": np.asarray(dec_sd[f"lstm.bias_hh_l{l}"]),
        }
    params["lstm"] = lstm
    if cfg.deep_output:
        params["out_context"] = _lin(dec_sd, "output.context", bias=False)
    if not (cfg.weight_tying and cfg.deep_output):
        params["out_proj"] = _lin(dec_sd, "output.output",
                                  bias=not cfg.weight_tying)
    return params


def config_from_hparams(hparams: Dict[str, Any]) -> SATConfig:
    """Reference hparams dict -> SATConfig (field names match by design)."""
    import dataclasses
    known = {f.name for f in dataclasses.fields(SATConfig)}
    kw = {}
    for k, v in hparams.items():
        if k == "vocab_itos":
            continue
        if k in known:
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
    return SATConfig(**kw)


def load_reference_checkpoint(path_or_ckpt, arch: Optional[str] = None):
    """Lightning .ckpt (path or loaded dict) -> (cfg, variables, grid_hw).

    The result drops straight into SATModel / decode / evalx tools."""
    import jax
    import jax.numpy as jnp
    from .encoder import probe_encoder

    if isinstance(path_or_ckpt, str):
        import torch
        ckpt = torch.load(path_or_ckpt, map_location="cpu", weights_only=False)
    else:
        ckpt = path_or_ckpt
    hparams = ckpt.get("hyper_parameters", ckpt.get("hparams", {}))
    cfg = config_from_hparams(dict(hparams))
    arch = arch or cfg.encoder_arch
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in ckpt["state_dict"].items()}

    enc_sd, proj_sd, dec_sd = split_reference_state_dict(sd, arch)
    backbone_params, backbone_stats = convert_backbone(arch, enc_sd)
    enc_params: Dict[str, Any] = {"backbone": backbone_params}
    if proj_sd:
        enc_params["proj"] = {
            "kernel": np.asarray(proj_sd["weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(proj_sd["bias"])}
    dec_params = convert_decoder(dec_sd, cfg)

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": {"encoder": enc_params, "decoder": dec_params},
        "state": {"batch_stats": ({"backbone": backbone_stats}
                                  if backbone_stats else {})},
    })
    _, grid = probe_encoder(cfg)
    return cfg, variables, grid


def main(argv=None):
    """Convert a reference Lightning .ckpt into a SAT-TPU .ckpt."""
    import argparse
    from ..train.checkpoints import save_checkpoint

    p = argparse.ArgumentParser(
        description="reference Lightning checkpoint -> SAT-TPU checkpoint")
    p.add_argument("--input", required=True, help="Lightning .ckpt path")
    p.add_argument("--output", required=True, help="SAT-TPU .ckpt path")
    p.add_argument("--arch", default=None,
                   help="override encoder arch (default: from hparams)")
    a = p.parse_args(argv)
    cfg, variables, grid = load_reference_checkpoint(a.input, arch=a.arch)
    import jax
    save_checkpoint(a.output, cfg, {
        "params": jax.device_get(variables["params"]),
        "state": jax.device_get(variables["state"]),
        "step": 0, "epoch": 0})
    print(f"converted {a.input} -> {a.output} "
          f"(arch={cfg.encoder_arch}, vocab={cfg.vocab_size}, grid={grid})")


if __name__ == "__main__":
    main()
