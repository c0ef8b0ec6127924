"""SAT encoder: normalize -> backbone -> 1x1 projection -> encoder_size
pool/upsample -> FlattenShuffle.

Mirrors the reference's README/experiments encoder variant (reference:
readme.md:110-125; dev/dev_encoder.py:81-100; get_encoder at model.py:16-63):

* ``Normalize(mean, std)`` as the first layer so the model ingests raw [0,1]
  images (model.py:59-62).
* Optional 1x1 conv forcing ``encoder_dim`` channels when it differs from the
  backbone's output (model.py:50-53); otherwise the discovered dim is written
  back into the config (model.py:56) — here via ``build_encoder``.
* ``encoder_size``: AdaptiveAvgPool2d when the feature map is larger, bilinear
  Upsample(align_corners=False) when smaller (readme.md:119-122;
  dev/dev_adaptive_avg.py:18-26).
* FlattenShuffle to (batch, locations, encoder_dim) (readme.md:123).

The shape probe uses ``jax.eval_shape`` — the XLA-native version of the
reference's fake-image forward (model.py:46-48), zero FLOPs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SATConfig
from ..ops.image_ops import adaptive_avg_pool2d, bilinear_resize, normalize_image
from .backbones import BACKBONES, FOLD_NORM_ARCHS


class SATEncoder(nn.Module):
    arch: str
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    encoder_dim: Optional[int] = None
    encoder_size: Optional[int] = None
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, flatten: bool = True,
                 stem_out: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, H, W, 3) raw [0,1] images -> (B, L, D) annotations
        (or the 4-D feature map when flatten=False, the checked-out reference's
        contract for 2-D attention visualization, model.py:96-98).

        stem_out: optional pre-computed stem output from an alternative stem
        formulation (models/packed_stem.py) — the backbone resumes after its
        stem+pool (see SATModel._stem_out)."""
        if self.arch not in BACKBONES:
            raise ValueError(f"Encoder not supported : {self.arch}")
        extra = {"stem_out": stem_out} if stem_out is not None else {}
        if self.arch in FOLD_NORM_ARCHS:
            # Normalize folds into the stem conv's kernel — exact, including
            # padded borders (backbones.FoldedStemConv), and removes a
            # full-image bandwidth pass (~7% of the greedy-decode step)
            x = BACKBONES[self.arch](train=self.train,
                                     fold_norm=(tuple(self.mean),
                                                tuple(self.std)),
                                     name="backbone")(x, **extra)
        else:
            x = normalize_image(x, self.mean, self.std)
            x = BACKBONES[self.arch](train=self.train, name="backbone")(x)
        if self.encoder_dim is not None and self.encoder_dim != x.shape[-1]:
            # 1x1 conv forcing encoder_dim features (model.py:50-53)
            x = nn.Conv(self.encoder_dim, (1, 1), use_bias=True, name="proj")(x)
        if self.encoder_size is not None:
            h = x.shape[1]
            if self.encoder_size < h:
                x = adaptive_avg_pool2d(x, (self.encoder_size, self.encoder_size))
            elif self.encoder_size > h:
                x = bilinear_resize(x, (self.encoder_size, self.encoder_size))
        if not flatten:
            return x
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)  # FlattenShuffle


def probe_encoder(cfg: SATConfig) -> Tuple[int, Tuple[int, int]]:
    """Zero-FLOP shape probe: returns (final_dim, (grid_h, grid_w))."""
    module = SATEncoder(arch=cfg.encoder_arch, mean=cfg.mean, std=cfg.std,
                        encoder_dim=cfg.encoder_dim,
                        encoder_size=cfg.encoder_size, train=False)
    fake = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    out, _ = jax.eval_shape(
        lambda f: module.init_with_output(jax.random.PRNGKey(0), f, flatten=False),
        fake)
    _, h, w, c = out.shape
    return int(c), (int(h), int(w))


def build_encoder(cfg: SATConfig, rng: jax.Array,
                  train: bool = False):
    """Instantiate + init the encoder, writing the discovered encoder_dim back
    into the config like the reference (model.py:56).

    Returns (module, variables, updated_cfg, grid_hw)."""
    final_dim, grid = probe_encoder(cfg)
    cfg = cfg.replace(encoder_dim=final_dim)
    module = SATEncoder(arch=cfg.encoder_arch, mean=cfg.mean, std=cfg.std,
                        encoder_dim=cfg.encoder_dim,
                        encoder_size=cfg.encoder_size, train=train)
    fake = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    variables = module.init(rng, fake)
    return module, variables, cfg, grid
