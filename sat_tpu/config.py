"""Typed configuration for the SAT-TPU framework.

Mirrors the ~60 argparse flags of the reference trainer (reference: train.py:16-165)
as a dataclass, plus the data-derived overrides the reference applies at runtime
(reference: train.py:238-242 stuffs vocab/embed metadata into args; model.py:56
writes the discovered encoder_dim back).  The full config is serialized into every
checkpoint so a checkpoint is a self-contained deployment artifact
(reference: model.py:142 save_hyperparameters)."""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

METRIC_CHOICES = ("bleu1", "bleu2", "bleu3", "bleu4", "gleu")

ENCODER_ARCHS = (
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d", "wide_resnet50_2", "wide_resnet101_2",
    "squeezenet1_0", "squeezenet1_1",
    "densenet121", "densenet169", "densenet201", "densenet161",
    "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5", "shufflenet_v2_x2_0",
    "mobilenet_v2", "mobilenet_v3_large", "mobilenet_v3_small",
    "mnasnet0_5", "mnasnet0_75", "mnasnet1_0", "mnasnet1_3",
)


@dataclass
class SATConfig:
    # -- Init and setup (reference: train.py:21-32)
    seed: int = 42
    name: str = "default"
    workers: int = 0
    benchmark: bool = False
    precision: int = 32               # 32 = fp32, 16 = bf16 compute (TPU-native AMP)
    # TPU hardware RngBitGenerator for the BULK random draws (aug noise,
    # dropout masks) — 3.3x faster than threefry at image shapes; streams
    # stay threefry-derived so runs are deterministic per backend (bit-exact
    # resume holds), just not bit-identical across backends/XLA versions.
    # False = pure threefry everywhere (cross-backend-reproducible masks).
    fast_rng: bool = True

    # -- Dataset (reference: train.py:34-41)
    json: Optional[str] = None
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    bucket_sampler: bool = False
    cache_images: bool = False   # RAM-cache decoded images (subset-scale data)
    native_decode: Optional[bool] = None  # C++ jpeg pipeline (None = auto-detect)
    # Stage the ENTIRE train split's pixels in HBM once (uint8) and gather
    # each batch by index inside the jitted step — no per-batch host decode
    # or relay upload (VERDICT r3 #3: host feeding ran the soak chip ~98%
    # idle).  Batch order, caption trims, and augmentation rng are identical
    # to the host path; bit-exact when images decode to exactly
    # (input_size, input_size) — true for the synthetic soak tasks.
    # Single-process only (16k x 224^2 x 3 uint8 = 2.4 GB / 16 GB HBM).
    device_resident_data: bool = False
    # With device_resident_data: scan this many train steps inside ONE
    # jitted dispatch (captions/indices/LRs for the whole chunk upload
    # together).  Through the axon relay a per-step dispatch pays ~50 ms of
    # RTT against a ~4 ms b64 compute step — chunking moved the soak from
    # 1.1k to >10k imgs/s.  Restart-on-LR-increase checkpoints are detected
    # at chunk boundaries (the LR trajectory itself is exact).  1 = the
    # per-step path.
    steps_per_dispatch: int = 32
    # whole-net channel-permutation folding for the shufflenet family's
    # inference path (models/shufflenet_folded.py): every channel shuffle
    # becomes a kernel-side row gather + a few contiguous-slice concats —
    # the riffle relayouts were 44% of the b512 greedy step.  None = auto
    # (ON for shufflenet_v2_* in eval; exact math, fp order aside)
    folded_encoder: Optional[bool] = None
    # space-to-depth packed XLA stem on the inference path
    # (models/packed_stem.py): one 5x5/s4 conv at 96 lanes + 9-slice pool
    # instead of the 24-lane 3x3/s2 conv + reduce_window.  Validated opt-in:
    # the real-chip A/B went to the plain XLA stem (1.97 vs 1.25 ms/batch
    # @b512, the pool's channel-offset slices relayout — EXPERIMENTS.md
    # "packed stem verdict"), so None/False = off
    packed_stem: Optional[bool] = None

    # -- Vision encoder (reference: train.py:43-51; readme.md:110-125 encoder_size variant)
    encoder_arch: str = "shufflenet_v2_x0_5"
    input_size: int = 224
    pretrained: bool = False
    pretrained_weights: Optional[str] = None   # path to a torchvision state_dict (offline import)
    encoder_finetune_after: int = -1
    # Frozen-phase encoder in EVAL mode (VERDICT r3 #5): while the encoder
    # is frozen (before encoder_finetune_after fires), run it through the
    # inference path — eval-mode BN on running stats, no batch-stat
    # updates, and (for shufflenet) the whole-net shuffle-permutation
    # folding that removed the 44%-class riffle relayouts from the decode
    # step.  OFF by default: the reference keeps train-mode BN while
    # frozen (requires_grad=False only, model.py:22-25 — Lightning leaves
    # the module in train()), and the trajectory-parity tests pin that
    # path; this is a measured opt-in for frozen-phase throughput.
    # QUALITY CAVEAT (ADVICE r4): eval-mode BN reads RUNNING stats, which
    # are never updated while frozen.  With pretrained=False those are the
    # init stats (mean 0 / var 1) for the whole frozen phase, and the
    # encoder later unfreezes into train-mode BN with cold statistics —
    # intended for pretrained/warm-stat encoders; Trainer warns otherwise.
    frozen_encoder_eval: bool = False
    encoder_dim: Optional[int] = None
    encoder_size: Optional[int] = None         # adaptive-pool / upsample target grid size

    # -- Text decoder (reference: train.py:53-66)
    embed_dim: int = 256
    embed_norm: Optional[float] = None
    attention_dim: int = 128
    decoder_dim: int = 512
    decoder_layers: int = 1
    decoder_tf: Optional[str] = None           # always | linear | inv_sigmoid | exp
    decoder_tf_min: float = 0.5

    # -- General training (reference: train.py:68-73)
    batch: int = 1
    accumulate: int = 1
    # In-step microbatching (TPU-only extension, no reference analogue):
    # the jitted train step computes gradients by scanning over batch/microbatch
    # chunks and summing, so the activation working set stays at the chunk
    # size while the optimizer update (and host round-trip) still happens once
    # per full batch.  Unlike --accumulate (optax.MultiSteps across steps),
    # the loss weighting reproduces the FULL-batch loss exactly: CE chunks are
    # weighted by their valid-token counts against the global total.  0 = off.
    microbatch: int = 0
    epochs: int = 10

    # -- Optimizer (reference: train.py:75-98)
    opt: str = "adam"                          # sgd | adam | adamw
    encoder_lr: float = 1e-5
    decoder_lr: float = 1e-3
    embedding_lr: float = 1e-2
    lr_warmup_steps: int = 0
    momentum: float = 0.9
    nesterov: bool = False
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    grad_clip: str = "value"                   # value | norm
    clip_value: float = 0.0                    # 0 = no clipping
    min_lr: float = 0.0

    # -- Scheduler (reference: train.py:100-120)
    scheduler: Optional[str] = None            # step | plateau | exp | cosine | one_cycle
    lr_gamma: float = 0.1
    milestones: Tuple[int, ...] = (10, 15)
    plateau_patience: int = 20
    plateau_monitor: str = "bleu4"
    cosine_iterations: float = 1e3
    cosine_multi: int = 1
    one_cycle_pct: float = 0.3
    one_cycle_div: float = 25.0
    one_cycle_fdiv: float = 1e4

    # -- Validation (reference: train.py:122-129)
    val_interval: int = 5
    val_percent: float = 1.0
    val_beamk: int = 3
    val_max_len: int = 32
    # early-exit validation decode: stop when every caption ends (exact —
    # tests/test_beam_search.py::test_early_exit_matches_scan)
    val_early_exit: bool = True

    # -- Callbacks (reference: train.py:131-138)
    save_top_k: int = 1
    save_monitor: str = "bleu4"
    # last.ckpt refresh cadence in validations.  1 = reference save_last=True
    # parity (train.py:187).  Larger values skip the refresh (and with it the
    # full checkpoint-tree device->host fetch) on validations where top-k
    # doesn't fire — the soak-ladder lever; costs only resume granularity.
    save_last_every: int = 1
    early_stop_monitor: Optional[str] = None
    early_stop_patience: int = 6

    # -- Misc (reference: train.py:140-147)
    dropout: float = 0.0
    embedding_dropout: float = 0.0
    label_smoothing: float = 0.0
    weight_tying: bool = False

    # -- Augmentations (reference: train.py:149-158)
    aug_scale: float = 0.9
    aug_hflip: float = 0.5
    aug_color_jitter: float = 0.0
    aug_optical_strength: float = 0.0
    aug_noise_std: float = 0.01

    # -- SAT specific (reference: train.py:160-163)
    deep_output: bool = False
    att_gamma: float = 1.0

    # -- TPU-native parallelism (no reference equivalent; replaces --gpus at train.py:27-28)
    mesh_shape: Tuple[int, ...] = (-1,)        # -1 = all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)

    # -- resume + profiling (reference: save_last=True resume-by-hand, train.py:187)
    resume: Optional[str] = None               # checkpoint path to resume from
    profile_dir: Optional[str] = None          # jax.profiler trace output dir
    log_every: int = 16   # steps per buffered metric fetch (1 = per-step);
    # every step's scalars are still logged with their own step number —
    # this only batches the device->host round-trips

    # -- Data-derived fields (reference: train.py:238-242, 250; model.py:56)
    vocab_stoi: Optional[Dict[str, int]] = None
    vocab_size: Optional[int] = None
    pretrained_embedding: Optional[str] = None
    train_loader_len: Optional[int] = None
    max_cap_length: Optional[int] = None       # full encoded length incl <START>/<END>/pads

    # ------------------------------------------------------------------

    @property
    def compute_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.precision == 16 else jnp.float32

    def replace(self, **kw) -> "SATConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SATConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in known:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "SATConfig":
        return cls.from_dict(json.loads(s))

    def validate(self) -> "SATConfig":
        assert self.precision in (16, 32)
        assert self.opt in ("sgd", "adam", "adamw")
        assert self.grad_clip in ("value", "norm")
        if self.scheduler is not None:
            assert self.scheduler in ("step", "plateau", "exp", "cosine", "one_cycle")
        if self.decoder_tf is not None:
            assert self.decoder_tf in ("always", "linear", "inv_sigmoid", "exp")
        if self.vocab_size is not None and self.label_smoothing:
            # Smoothing of 0 is just regular cross entropy (reference: model.py:147)
            assert 0 <= self.label_smoothing < (self.vocab_size - 1) / self.vocab_size
        assert 0.0 <= self.aug_scale <= 1.0, "Invalid value for aug_scale. Choose in the range [0,1]."
        if self.encoder_lr > 0 and self.encoder_finetune_after == 0:
            # Reference-parity foot-gun (model.py:745-746): the encoder param
            # group is built only when encoder_finetune_after > 0, so =0
            # means the encoder NEVER trains even though the reference's
            # unfreeze hook (model.py:584-586) fires at step 0.  This
            # silently froze every round-3/4 soak rung and mislabeled the
            # bench "finetune" train metric — warn loudly.
            import sys as _sys
            print("WARNING: encoder_finetune_after=0 with encoder_lr>0: the "
                  "encoder will NEVER train (the optimizer group requires "
                  "encoder_finetune_after > 0, matching the reference's "
                  "configure_optimizers).  Use encoder_finetune_after=1 to "
                  "finetune from the first step.", file=_sys.stderr)
        return self


def _add_bool_flag(p: argparse.ArgumentParser, name: str, help: str = ""):
    p.add_argument(f"--{name}", default=False, action="store_true", help=help)


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI mirroring reference train.py:16-165 flag-for-flag (minus --gpus, plus mesh flags)."""
    p = argparse.ArgumentParser(description="SAT-TPU trainer")
    d = SATConfig()
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--name", default=d.name, type=str)
    p.add_argument("--workers", default=d.workers, type=int)
    _add_bool_flag(p, "benchmark")
    _add_bool_flag(p, "fast_rng")
    p.add_argument("--precision", default=d.precision, type=int, choices=[16, 32])
    p.add_argument("--json", type=str, required=False, default=None)
    p.add_argument("--mean", nargs=3, default=list(d.mean), type=float)
    p.add_argument("--std", nargs=3, default=list(d.std), type=float)
    _add_bool_flag(p, "bucket_sampler")
    _add_bool_flag(p, "cache_images")
    _add_bool_flag(p, "device_resident_data")
    p.add_argument("--steps_per_dispatch", default=d.steps_per_dispatch,
                   type=int)
    p.add_argument("--native_decode", default=None, action="store_true",
                   help="force the C++ jpeg pipeline (default: auto-detect)")
    p.add_argument("--no_native_decode", dest="native_decode",
                   action="store_false")
    p.add_argument("--folded_encoder", default=None, action="store_true",
                   help="whole-net shuffle-permutation folding on the "
                        "shufflenet inference path (exact). Default: auto "
                        "(on for shufflenet_v2_*)")
    p.add_argument("--no_folded_encoder", dest="folded_encoder",
                   action="store_false")
    p.add_argument("--packed_stem", default=None, action="store_true",
                   help="space-to-depth packed XLA stem (inference; exact). "
                        "Default off: the plain XLA stem measured faster "
                        "on v5e (EXPERIMENTS.md packed-stem verdict)")
    p.add_argument("--no_packed_stem", dest="packed_stem",
                   action="store_false")
    p.add_argument("--encoder_arch", default=d.encoder_arch, type=str)
    p.add_argument("--input_size", default=d.input_size, type=int)
    _add_bool_flag(p, "pretrained")
    p.add_argument("--pretrained_weights", default=None, type=str)
    p.add_argument("--encoder_finetune_after", default=d.encoder_finetune_after, type=int)
    _add_bool_flag(p, "frozen_encoder_eval")
    p.add_argument("--encoder_dim", default=None, type=int)
    p.add_argument("--encoder_size", default=None, type=int)
    p.add_argument("--embed_dim", default=d.embed_dim, type=int)
    p.add_argument("--embed_norm", default=None, type=float)
    p.add_argument("--attention_dim", default=d.attention_dim, type=int)
    p.add_argument("--decoder_dim", default=d.decoder_dim, type=int)
    p.add_argument("--decoder_layers", default=d.decoder_layers, type=int)
    p.add_argument("--decoder_tf", default=None, type=str,
                   choices=["always", "linear", "inv_sigmoid", "exp"])
    p.add_argument("--decoder_tf_min", default=d.decoder_tf_min, type=float)
    p.add_argument("--batch", default=d.batch, type=int)
    p.add_argument("--accumulate", default=d.accumulate, type=int)
    p.add_argument("--microbatch", default=d.microbatch, type=int,
                   help="in-step gradient chunking: scan the jitted step over "
                        "batch/microbatch chunks (bounds the HBM working set "
                        "at the chunk size; loss ≡ full-batch). 0 = off")
    p.add_argument("--epochs", default=d.epochs, type=int)
    p.add_argument("--opt", default=d.opt, type=str, choices=["sgd", "adam", "adamw"])
    p.add_argument("--encoder_lr", default=d.encoder_lr, type=float)
    p.add_argument("--decoder_lr", default=d.decoder_lr, type=float)
    p.add_argument("--embedding_lr", default=d.embedding_lr, type=float)
    p.add_argument("--lr_warmup_steps", default=d.lr_warmup_steps, type=int)
    p.add_argument("--momentum", default=d.momentum, type=float)
    _add_bool_flag(p, "nesterov")
    p.add_argument("--weight_decay", default=d.weight_decay, type=float)
    p.add_argument("--adam_b1", default=d.adam_b1, type=float)
    p.add_argument("--adam_b2", default=d.adam_b2, type=float)
    p.add_argument("--grad_clip", default=d.grad_clip, type=str, choices=["value", "norm"])
    p.add_argument("--clip_value", default=d.clip_value, type=float)
    p.add_argument("--min_lr", default=d.min_lr, type=float)
    p.add_argument("--scheduler", default=None, type=str,
                   choices=["step", "plateau", "exp", "cosine", "one_cycle"])
    p.add_argument("--lr_gamma", default=d.lr_gamma, type=float)
    p.add_argument("--milestones", nargs="+", default=list(d.milestones), type=int)
    p.add_argument("--plateau_patience", default=d.plateau_patience, type=int)
    p.add_argument("--plateau_monitor", default=d.plateau_monitor, type=str, choices=list(METRIC_CHOICES))
    p.add_argument("--cosine_iterations", default=d.cosine_iterations, type=float)
    p.add_argument("--cosine_multi", default=d.cosine_multi, type=int)
    p.add_argument("--one_cycle_pct", default=d.one_cycle_pct, type=float)
    p.add_argument("--one_cycle_div", default=d.one_cycle_div, type=float)
    p.add_argument("--one_cycle_fdiv", default=d.one_cycle_fdiv, type=float)
    p.add_argument("--val_interval", default=d.val_interval, type=int)
    p.add_argument("--val_percent", default=d.val_percent, type=float)
    p.add_argument("--val_beamk", default=d.val_beamk, type=int)
    p.add_argument("--val_max_len", default=d.val_max_len, type=int)
    p.add_argument("--no_val_early_exit", dest="val_early_exit",
                   action="store_false", default=d.val_early_exit)
    p.add_argument("--save_top_k", default=d.save_top_k, type=int)
    p.add_argument("--save_last_every", default=d.save_last_every, type=int)
    p.add_argument("--save_monitor", default=d.save_monitor, type=str, choices=list(METRIC_CHOICES))
    p.add_argument("--early_stop_monitor", default=None, type=str, choices=list(METRIC_CHOICES))
    p.add_argument("--early_stop_patience", default=d.early_stop_patience, type=int)
    p.add_argument("--dropout", default=d.dropout, type=float)
    p.add_argument("--embedding_dropout", default=d.embedding_dropout, type=float)
    p.add_argument("--label_smoothing", default=d.label_smoothing, type=float)
    _add_bool_flag(p, "weight_tying")
    p.add_argument("--aug_scale", default=d.aug_scale, type=float)
    p.add_argument("--aug_hflip", default=d.aug_hflip, type=float)
    p.add_argument("--aug_color_jitter", default=d.aug_color_jitter, type=float)
    p.add_argument("--aug_optical_strength", default=d.aug_optical_strength, type=float)
    p.add_argument("--aug_noise_std", default=d.aug_noise_std, type=float)
    _add_bool_flag(p, "deep_output")
    p.add_argument("--att_gamma", default=d.att_gamma, type=float)
    p.add_argument("--mesh_shape", nargs="+", default=list(d.mesh_shape), type=int)
    p.add_argument("--mesh_axes", nargs="+", default=list(d.mesh_axes), type=str,
                   help="mesh axis names; 'data model' enables vocab-dim "
                        "tensor parallelism on the second axis")
    p.add_argument("--resume", default=None, type=str,
                   help="checkpoint path to resume training from")
    p.add_argument("--log_every", default=d.log_every, type=int,
                   help="steps per buffered metric fetch (1 = per-step sync)")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="write a jax.profiler trace of the first epoch here")
    return p


def config_from_args(argv: Optional[Sequence[str]] = None) -> SATConfig:
    args = build_arg_parser().parse_args(argv)
    kw = vars(args)
    for key in ("mean", "std", "milestones", "mesh_shape", "mesh_axes"):
        kw[key] = tuple(kw[key])
    return SATConfig(**kw).validate()
