"""Full SAT model assembly: encoder (Flax) + decoder (explicit pytree).

The checkpointable unit mirrors the reference's self-contained LightningModule
(reference: model.py:134-199): params + full config + vocab travel together.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SATConfig
from ..vocab import Vocab
from .decoder import init_decoder_params
from .encoder import SATEncoder, build_encoder


class SATModel:
    """Stateless model bundle: modules + static config. Params live outside."""

    def __init__(self, cfg: SATConfig, grid_hw: Tuple[int, int]):
        assert cfg.encoder_dim is not None and cfg.vocab_size is not None
        self.cfg = cfg
        self.grid_hw = grid_hw
        self.vocab = Vocab(cfg.vocab_stoi)
        self.encoder_train = SATEncoder(
            arch=cfg.encoder_arch, mean=cfg.mean, std=cfg.std,
            encoder_dim=cfg.encoder_dim, encoder_size=cfg.encoder_size, train=True)
        self.encoder_eval = self.encoder_train.copy(train=False)

    # -- construction -----------------------------------------------------

    @classmethod
    def create(cls, cfg: SATConfig, rng: jax.Array,
               pretrained_embedding: Optional[np.ndarray] = None
               ) -> Tuple["SATModel", Dict[str, Any]]:
        """Init a fresh model. Loads the pretrained GloVe matrix if the config
        points at one (reference: model.py:165-168)."""
        r_enc, r_dec = jax.random.split(rng)
        _, enc_vars, cfg, grid = build_encoder(cfg, r_enc)
        if pretrained_embedding is None and cfg.pretrained_embedding:
            pretrained_embedding = np.load(cfg.pretrained_embedding)
        dec_params = init_decoder_params(r_dec, cfg, pretrained_embedding)
        model = cls(cfg, grid)
        params = {
            "encoder": enc_vars["params"],
            "decoder": dec_params,
        }
        state = {"batch_stats": enc_vars.get("batch_stats", {})}
        variables = {"params": params, "state": state}
        if cfg.pretrained and cfg.pretrained_weights:
            # offline torchvision state_dict import (reference: model.py:20
            # downloads pretrained weights; here zero-egress -> file-based)
            from .torch_import import import_pretrained
            variables = jax.tree_util.tree_map(
                jnp.asarray, import_pretrained(cfg.encoder_arch,
                                               cfg.pretrained_weights, variables))
        return model, variables

    # -- encoder forward ---------------------------------------------------

    def encode(self, variables: Dict[str, Any], images: jax.Array,
               train: bool = False):
        """images (B, H, W, 3) in [0,1] -> annotations (B, L, D).

        In train mode returns (annotations, new_batch_stats)."""
        enc_vars = {"params": variables["params"]["encoder"],
                    "batch_stats": variables["state"]["batch_stats"]}
        if train:
            annots, mutated = self.encoder_train.apply(
                enc_vars, images, mutable=["batch_stats"])
            return annots, mutated["batch_stats"]
        if self._folded_encoder_applies(images):
            from .shufflenet_folded import folded_encode
            return folded_encode(variables, images, self.cfg,
                                 stem_out=self._stem_out(variables, images))
        return self.encoder_eval.apply(
            enc_vars, images, stem_out=self._stem_out(variables, images))

    def encode_features(self, variables: Dict[str, Any], images: jax.Array):
        """4-D feature map path (flatten=False) for visualization."""
        if self._folded_encoder_applies(images):
            from .shufflenet_folded import folded_encode
            return folded_encode(variables, images, self.cfg, flatten=False,
                                 stem_out=self._stem_out(variables, images))
        enc_vars = {"params": variables["params"]["encoder"],
                    "batch_stats": variables["state"]["batch_stats"]}
        return self.encoder_eval.apply(
            enc_vars, images, flatten=False,
            stem_out=self._stem_out(variables, images))

    def _folded_encoder_applies(self, images: jax.Array) -> bool:
        """Whole-net shuffle-permutation folding (models/shufflenet_folded.py)
        on the eval path.  Auto policy (cfg.folded_encoder=None): ON for the
        shufflenet_v2 family — the folded forward is the same math in a
        layout XLA schedules without the riffle relayout copies that cost
        44% of the b512 greedy step (EXPERIMENTS.md round-3 profile)."""
        cfg = self.cfg
        if cfg.folded_encoder is False:
            return False
        if not cfg.encoder_arch.startswith("shufflenet_v2"):
            return False
        return images.shape[-1] == 3

    def _stem_out(self, variables: Dict[str, Any],
                  images: jax.Array) -> Optional[jax.Array]:
        """Inference-stem override: the packed XLA stem, a measured opt-in
        (default: the plain XLA stem).  A fused Pallas stem kernel also
        lived behind this hook through rounds 2-3; it lost three hardware
        A/Bs (per-image grid 2.6x, batch-tiled grid 2.8x — VPU-bound on
        patch/pool shuffling, not dot- or grid-overhead-bound) and was
        retired per VERDICT r2 #7 (kernels/stem.py in git history;
        EXPERIMENTS.md "stem kernel retired")."""
        return self._packed_stem_out(variables, images)

    def _packed_stem_out(self, variables: Dict[str, Any],
                         images: jax.Array) -> Optional[jax.Array]:
        """Space-to-depth packed stem (models/packed_stem.py): exact
        re-expression of conv1+BN+relu+maxpool with the 2x2 output block
        packed into lanes — built because the 24-channel stem ran at 24/128
        lane occupancy (~22% of the b512 greedy-decode step).  The real-chip
        xplane A/B went AGAINST it: packed conv 1.06 vs 0.79 ms/batch and
        9-slice pool 0.91 vs 0.46 (the channel-offset slices relayout the
        packed tensor; EXPERIMENTS.md "round 3: packed stem verdict"), so
        the auto policy is OFF; --packed_stem opts in (numerics pinned by
        tests/test_packed_stem.py)."""
        from .packed_stem import (packed_stem_pool, packed_stem_supported,
                                  stem_plan)
        cfg = self.cfg
        if cfg.packed_stem is False or (cfg.packed_stem is None
                                        and not self._packed_stem_auto()):
            return None
        plan = stem_plan(cfg.encoder_arch)
        b, h, w, c = images.shape
        if plan is None or c != 3:
            return None
        conv_name, bn_name, act, pool, kh = plan
        if kh != 3 or act != "relu" or not pool:
            return None   # 3x3-stem + relu + maxpool geometries only
        bp = variables["params"]["encoder"]["backbone"]
        bs = variables["state"]["batch_stats"]["backbone"]
        kernel = bp[conv_name]["kernel"]
        if not packed_stem_supported(h, w, kernel):
            return None
        return packed_stem_pool(
            images, kernel, bp[bn_name]["scale"], bp[bn_name]["bias"],
            bs[bn_name]["mean"], bs[bn_name]["var"], 1e-5, cfg.mean, cfg.std)

    def _packed_stem_auto(self) -> bool:
        # measured on v5e @b512: packed stem 1.97 vs XLA stem 1.25 ms/batch
        return False

    # -- inference API (reference: SAT.caption at model.py:214-235) --------

    def caption(self, variables: Dict[str, Any], images: jax.Array,
                beamk: int = 3, max_gen_length: int = 32, temperature=1.0,
                sample_method: str = "beam", sample_topk: int = 3,
                decoder_noise: Optional[float] = None,
                rescore_method: Optional[str] = None,
                rescore_reward: float = 0.5, return_all: bool = False,
                rng: Optional[jax.Array] = None, early_exit: bool = False):
        """images (B, H, W, 3) [0,1] -> (captions, scores, alphas, perplexity)
        python lists, the reference's exact output contract."""
        from ..decode.api import caption_from_annotations
        annots = self.encode(variables, images, train=False)
        return caption_from_annotations(
            variables["params"]["decoder"], self.cfg, annots, self.grid_hw,
            beamk=beamk, max_gen_length=max_gen_length, temperature=temperature,
            sample_method=sample_method, sample_topk=sample_topk,
            decoder_noise=decoder_noise, rescore_method=rescore_method,
            rescore_reward=rescore_reward, return_all=return_all, rng=rng,
            early_exit=early_exit)
