"""SAT-TPU: a TPU-native Show, Attend and Tell framework (JAX/XLA/Pallas).

Public API (lazy — importing sat_tpu does not initialize jax):

    sat_tpu.SATConfig / config_from_args   typed config mirroring the
                                           reference train.py flags
    sat_tpu.Trainer                        full training engine
    sat_tpu.SATModel                       model bundle (encoder zoo + decoder)
    sat_tpu.beam_search / greedy_decode    batched on-device decoding
    sat_tpu.load_any_checkpoint (SAT-TPU or Lightning .ckpt) /
        load_model_from_checkpoint / save_checkpoint
    sat_tpu.CaptionDataset / CaptionLoader
    sat_tpu.preprocess_karpathy / make_synthetic_dataset / make_learnable_dataset
    sat_tpu.score_captions                 corpus BLEU/GLEU/cossim/perplexity
    sat_tpu.create_mesh                    device mesh for DP / vocab-TP
"""

from importlib import import_module

from .config import SATConfig, config_from_args
from .vocab import Vocab

__version__ = "0.1.0"

_LAZY = {
    "Trainer": ".train.loop",
    "SATModel": ".models.model",
    "beam_search": ".decode.beam",
    "greedy_decode": ".decode.beam",
    "load_model_from_checkpoint": ".train.checkpoints",
    "load_any_checkpoint": ".train.checkpoints",
    "save_checkpoint": ".train.checkpoints",
    "CaptionDataset": ".data.dataset",
    "CaptionLoader": ".data.dataset",
    "preprocess_karpathy": ".data.preprocess",
    "make_synthetic_dataset": ".data.preprocess",
    "make_learnable_dataset": ".data.preprocess",
    "score_captions": ".evalx.metrics",
    "create_mesh": ".parallel.mesh",
}

__all__ = ["SATConfig", "config_from_args", "Vocab", "__version__",
           *_LAZY.keys()]


def __getattr__(name):
    if name in _LAZY:
        return getattr(import_module(_LAZY[name], __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
