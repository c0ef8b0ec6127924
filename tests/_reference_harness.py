"""Shared literal-reference oracle harness (used by test_reference_oracle.py
and test_train_trajectory.py).

Imports the reference's OWN code — /root/reference/model.py — as the oracle,
with pytorch_lightning / torchvision stubbed (neither is installed), and
builds paired models: the reference SAT (with a fixed-annotations encoder)
and sat_tpu decoder params produced by the production converter.  See
test_reference_oracle.py's module docstring for the full rationale and the
InitLSTM layout-quirk notes."""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_DIR = "/root/reference"

V = 50
GRID_H, GRID_W = 2, 3          # non-square grid: catches flatten-order bugs
ENC_D = 24


def build_stubs():
    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self):
            import inspect
            from argparse import Namespace
            kwargs = inspect.currentframe().f_back.f_locals.get("kwargs", {})
            object.__setattr__(self, "hparams", Namespace(**kwargs))

        @property
        def device(self):
            return torch.device("cpu")

    pl.LightningModule = LightningModule

    class Trainer:  # util.py's RestartCheckpoint type-annotates with it
        pass

    pl.Trainer = Trainer

    cb = types.ModuleType("pytorch_lightning.callbacks")

    class ModelCheckpoint:  # util.py imports it; never constructed here
        pass

    class Callback:
        pass

    cb.ModelCheckpoint = ModelCheckpoint
    cb.Callback = Callback
    pl.callbacks = cb

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvt = types.ModuleType("torchvision.transforms")

    class Normalize(torch.nn.Module):
        def __init__(self, mean, std):
            super().__init__()

        def forward(self, x):
            return x

    tvt.Normalize = Normalize
    tv.models = tvm
    tv.transforms = tvt
    return {"pytorch_lightning": pl, "pytorch_lightning.callbacks": cb,
            "torchvision": tv, "torchvision.models": tvm,
            "torchvision.transforms": tvt}


def load_reference():
    """Import the reference's model.py + util.py (the REAL files).

    Returns (model_module, restore_fn); callers must invoke restore_fn when
    done (pytest fixtures wrap this in yield/finally)."""
    stubs = build_stubs()
    saved = {k: sys.modules.get(k) for k in list(stubs) + ["model", "util"]}
    sys.modules.update(stubs)
    sys.path.insert(0, REFERENCE_DIR)
    import importlib
    importlib.import_module("util")
    model = importlib.import_module("model")
    assert model.__file__.startswith(REFERENCE_DIR)

    def restore():
        sys.path.remove(REFERENCE_DIR)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    return model, restore


def make_vocab():
    stoi = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3}
    for i in range(4, V):
        stoi[f"w{i}"] = i
    itos = {v: k for k, v in stoi.items()}
    return stoi, itos


class FixedAnnotEncoder(torch.nn.Module):
    """Stands in for get_encoder: returns stored (B, D, H, W) annotations."""

    def __init__(self, annots: torch.Tensor):
        super().__init__()
        self.register_buffer("annots", annots)

    def forward(self, x):
        return self.annots[: x.shape[0]].to(x.dtype)


def make_pair(refmod, *, batch: int, decoder_layers: int = 1,
              deep_output: bool = True, weight_tying: bool = False,
              label_smoothing: float = 0.1, seed: int = 0,
              embed_norm=None, extra_hparams=None):
    """Returns (ref SAT in eval mode, sat_tpu cfg, sat_tpu decoder params,
    annots_torch (B,D,H,W), annots_jax (B,L,D)).

    extra_hparams: additional reference hparams (optimizer / scheduler /
    warmup fields read by configure_optimizers + training_step,
    reference model.py:559-628, 720-817) merged into the SAT kwargs."""
    import jax.numpy as jnp
    from sat_tpu.config import SATConfig
    from sat_tpu.models.lightning_import import convert_decoder

    torch.manual_seed(seed)
    stoi, itos = make_vocab()
    annots_t = torch.randn(batch, ENC_D, GRID_H, GRID_W)

    hp = dict(vocab_size=V, vocab_stoi=stoi, vocab_itos=itos,
              embed_dim=16, embed_norm=embed_norm, embedding_dropout=0.0,
              pretrained_embedding=None, encoder_dim=ENC_D,
              attention_dim=20, decoder_dim=28,
              decoder_layers=decoder_layers, deep_output=deep_output,
              weight_tying=weight_tying, dropout=0.0,
              label_smoothing=label_smoothing, att_gamma=1.0)
    hp.update(extra_hparams or {})

    orig_get_encoder = refmod.get_encoder
    refmod.get_encoder = lambda args: FixedAnnotEncoder(annots_t)
    try:
        sat = refmod.SAT(**hp)
    finally:
        refmod.get_encoder = orig_get_encoder
    sat.eval()
    if embed_norm is not None:
        # drive torch's in-place max_norm renormalization to its steady
        # state (every row accessed once) BEFORE weights are exported: the
        # pre-first-access transient is access-order-dependent mutable state
        # that any trained checkpoint has already left behind
        with torch.no_grad():
            sat.embedding(torch.arange(V))

    cfg = SATConfig(vocab_size=V, vocab_stoi=stoi, embed_dim=16,
                    attention_dim=20, decoder_dim=28, encoder_dim=ENC_D,
                    decoder_layers=decoder_layers, deep_output=deep_output,
                    weight_tying=weight_tying, embed_norm=embed_norm,
                    label_smoothing=label_smoothing, att_gamma=1.0,
                    dropout=0.0, embedding_dropout=0.0)

    # .copy() is load-bearing: .numpy() aliases the torch storage, and
    # jnp.asarray on CPU jax can be zero-copy — without it, torch-side
    # optimizer.step() in the trajectory tests silently rewrites the
    # "converted" jax params through the shared buffer
    dec_sd = {k: v.detach().numpy().copy() for k, v in sat.state_dict().items()
              if not k.startswith("encoder.")}
    params = {k: jnp.asarray(v) if not isinstance(v, dict) else v
              for k, v in convert_decoder(dec_sd, cfg).items()}
    params = __import__("jax").tree_util.tree_map(jnp.asarray, params)

    # reference SoftAttention flattens (b,c,h,w) -> (b, h*w, c) row-major
    # (model.py:97-98); same layout here
    annots_j = jnp.asarray(
        annots_t.permute(0, 2, 3, 1).reshape(batch, GRID_H * GRID_W, ENC_D)
        .numpy())
    return sat, cfg, params, annots_t, annots_j


def make_captions(batch_rows: int, T: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    caps = rng.integers(4, V, (batch_rows, T)).astype(np.int64)
    caps[:, 0] = 2                                  # <START>
    lens = rng.integers(2, T - 1, (batch_rows,)).astype(np.int64)
    for i, l in enumerate(lens):
        caps[i, l] = 3                              # <END> at position len
        caps[i, l + 1:] = 0                         # <PAD>
    return caps, lens
