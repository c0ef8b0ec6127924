"""Training engine: the TPU-native equivalent of the reference's Lightning
Trainer wiring + SAT training/validation steps (reference: train.py:168-287,
model.py:559-718).

One jitted, mesh-partitioned train step does: on-device augmentation -> encoder
-> teacher-forced decoder scan -> loss -> grads -> per-group-LR optax update.
Data parallelism comes from sharding the batch on the mesh "data" axis; the
gradient all-reduce is inserted by XLA (SURVEY.md §2.6).  Encoder finetuning
gates (reference: model.py:584-586) are a static recompile boundary so the
frozen phase never pays encoder backward FLOPs."""

from __future__ import annotations

import os
import queue
import sys
import threading
import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SATConfig
from ..data.dataset import CaptionDataset, CaptionLoader
from ..data.transforms import build_train_augment, val_preprocess
from ..decode.api import unpack_beam_result
from ..decode.beam import beam_search
from ..evalx.metrics import score_captions
from ..models.model import SATModel
from ..models.sat import train_forward_loss_grouped
from ..parallel.mesh import (create_mesh, fetch_global, fetch_tree_packed,
                             place_tree, shard_batch)
from .checkpoints import (RestartCheckpointManager, TopKCheckpointManager,
                          save_checkpoint)
from .logging import MetricsLogger, next_version_dir
from .optim import apply_group_lrs, build_optimizer
from .schedules import LRScheduler
from .tf_schedule import teacher_forcing_epsilon


class Trainer:
    def __init__(self, cfg: SATConfig, dataset: Optional[Any] = None,
                 log_root: str = "logs"):
        assert cfg.json is not None or dataset is not None
        if cfg.benchmark:
            # The reference's --benchmark sets cudnn.benchmark (reference:
            # train.py:29-30, 268): spend extra one-time effort so repeated
            # same-shape runs go faster.  XLA analogue: the persistent
            # compilation cache — every jitted shape compiled in this run is
            # a disk hit on the next run of the same config.
            cache_dir = os.environ.get(
                "SAT_TPU_XLA_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache", "sat_tpu_xla"))
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        if cfg.frozen_encoder_eval and not (cfg.pretrained
                                            or cfg.pretrained_weights):
            # ADVICE r4: eval-mode BN while frozen reads running stats that
            # are never updated; from-scratch encoders would run the whole
            # frozen phase on init stats (mean 0 / var 1) and unfreeze cold.
            print("WARNING: --frozen_encoder_eval with a from-scratch "
                  "encoder runs the frozen phase on INIT BN statistics "
                  "(mean 0/var 1); intended for pretrained encoders whose "
                  "running stats are warm", file=sys.stderr)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self._step_rng_base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), 0x5A7)

        # -- data (reference: train.py:235-259) --------------------------
        self.train_ds = CaptionDataset(dataset if dataset is not None else cfg.json,
                                       "train")
        self.val_ds = CaptionDataset(self.train_ds.json, "val")

        # dataset-derived config overrides (reference: train.py:238-242)
        js = self.train_ds.json
        cfg = cfg.replace(
            vocab_stoi=self.train_ds.vocab.stoi_map,
            vocab_size=js["vocab_size"],
            embed_dim=js["embed_dim"] if js.get("embed_dim") else cfg.embed_dim,
            pretrained_embedding=js.get("pretrained_embedding"),
            max_cap_length=js["max_cap_length"])

        # -- mesh (built before the loaders: batch shapes depend on it) ---
        self.mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axes)
        n_dev = int(self.mesh.devices.size)
        if cfg.batch % n_dev:
            raise ValueError(
                f"--batch {cfg.batch} must be divisible by the mesh device "
                f"count {n_dev} (mesh_shape={cfg.mesh_shape}): the batch is "
                f"sharded across every chip on the mesh")
        if cfg.microbatch and (cfg.microbatch >= cfg.batch
                               or cfg.batch % cfg.microbatch):
            # the in-step gate would otherwise silently run unchunked —
            # defeating the flag's whole purpose as the OOM-avoidance lever
            raise ValueError(
                f"--microbatch {cfg.microbatch} must be a divisor of "
                f"--batch {cfg.batch} smaller than it (the step scans "
                f"batch/microbatch gradient chunks)")

        # Multi-host: every process runs this same Trainer; loaders emit only
        # this host's rows of each global batch (mesh.shard_batch assembles).
        n_proc, proc_id = jax.process_count(), jax.process_index()
        self.train_loader = CaptionLoader(
            self.train_ds, cfg.batch, cfg.input_size,
            shuffle=not cfg.bucket_sampler, bucket=cfg.bucket_sampler,
            seed=cfg.seed, workers=cfg.workers, train=True,
            cache_images=cfg.cache_images, native_decode=cfg.native_decode,
            process_index=proc_id, process_count=n_proc)
        # keep the tail batch at val (each tail shape costs one extra compile;
        # multi-host drops it — ragged tails would disagree across hosts)
        val_batch = min(cfg.batch, len(self.val_ds))
        if n_proc > 1:
            # multi-host drops ragged tails, so every val batch must already
            # be divisible by the FULL mesh device count, not just n_proc
            val_batch = max(val_batch - val_batch % n_dev, n_dev)
        self.val_loader = CaptionLoader(
            self.val_ds, val_batch, cfg.input_size,
            shuffle=False, bucket=cfg.bucket_sampler, seed=cfg.seed,
            workers=cfg.workers, train=False, drop_last=n_proc > 1,
            cache_images=cfg.cache_images,  # val re-decodes every epoch
            native_decode=cfg.native_decode,
            process_index=proc_id, process_count=n_proc)
        cfg = cfg.replace(train_loader_len=len(self.train_loader)).validate()
        if cfg.device_resident_data and n_proc > 1:
            raise ValueError("device_resident_data is single-process: the "
                             "staged pixel array lives in one host's HBM "
                             "view (multi-host soaks keep the host loaders)")

        # -- model + optimizer -------------------------------------------
        self.rng, r_init = jax.random.split(self.rng)
        self.model, self.variables = SATModel.create(cfg, r_init)
        self.cfg = cfg = self.model.cfg  # encoder_dim written back
        self.tx, self.labels = build_optimizer(cfg, self.variables["params"])
        if cfg.accumulate > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=cfg.accumulate)
        self.opt_state = self.tx.init(self.variables["params"])

        self.scheduler = LRScheduler(cfg, steps_per_epoch=len(self.train_loader))
        self.augment = build_train_augment(cfg)

        self.global_step = 0
        self.current_epoch = 0
        self._resume_skip_batches = 0
        self.early_stop_count = 0
        self.early_stop_best: Optional[float] = None
        if cfg.resume:
            # self-contained resume: params + opt state + counters + LR
            # schedule state (reference: save_last=True resume, train.py:187)
            from flax import serialization
            from .checkpoints import load_checkpoint
            _, raw = load_checkpoint(cfg.resume)
            restore = lambda target, sd: serialization.from_state_dict(
                jax.device_get(target), sd)
            self.variables = {
                "params": restore(self.variables["params"], raw["params"]),
                "state": restore(self.variables["state"], raw["state"])}
            self.opt_state = restore(self.opt_state, raw["opt_state"])
            self.global_step = int(raw["step"])
            spe = max(len(self.train_loader), 1)
            self._resume_skip_batches = self.global_step % spe
            # epoch-boundary ckpt (top-k/last): offset 0 -> start next epoch.
            # mid-epoch ckpt (restart-{step}): re-enter the SAME epoch and
            # skip the batches already trained — stateless (seed, epoch)
            # data order makes the remainder replay exactly, so resume is
            # bit-exact for BOTH checkpoint kinds
            self.current_epoch = int(raw["epoch"]) + (
                1 if self._resume_skip_batches == 0 else 0)
            if "scheduler" in raw:
                self.scheduler.load_state_dict(raw["scheduler"])
            if "early_stop" in raw:
                best = float(raw["early_stop"]["best"])
                self.early_stop_best = None if best == float("-inf") else best
                self.early_stop_count = int(raw["early_stop"]["count"])
            # top-k registry restored onto the manager after it's built below
            self._resume_top_k = raw.get("top_k")
            self._resume_dir = os.path.dirname(os.path.abspath(cfg.resume))

        # -- sharding ------------------------------------------------------
        self.variables = place_tree(self.variables, self.mesh)
        self.opt_state = place_tree(self.opt_state, self.mesh)

        # -- logging + callbacks (reference: train.py:174-203) ------------
        # multi-host: process 0 owns every filesystem write; its version-dir
        # choice is broadcast so all ranks agree on self.logdir
        self.is_main = jax.process_index() == 0
        self.logdir = next_version_dir(log_root, cfg.name,
                                       create=self.is_main)
        if n_proc > 1:
            from jax.experimental import multihost_utils
            buf = np.zeros(1024, np.uint8)
            if self.is_main:
                raw = self.logdir.encode()
                assert len(raw) < 255  # buf[0] is a uint8 length prefix
                buf[0] = len(raw)
                buf[1:1 + len(raw)] = np.frombuffer(raw, np.uint8)
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            self.logdir = bytes(buf[1:1 + int(buf[0])]).decode()
        self.logger = MetricsLogger(self.logdir, enabled=self.is_main)
        self.ckpt = TopKCheckpointManager(self.logdir, cfg.save_monitor,
                                          cfg.save_top_k, write=self.is_main)
        if getattr(self, "_resume_top_k", None):
            # resumed runs keep enforcing save_top_k against pre-resume bests
            self.ckpt.load_state_dict(self._resume_top_k, self._resume_dir)
        self.restart_ckpt = RestartCheckpointManager(self.logdir,
                                                     cfg.lr_warmup_steps,
                                                     write=self.is_main)
        self.should_stop = False  # early-stop counters initialized pre-resume

        self._jit_train_step = jax.jit(
            self._train_step, static_argnames=("train_encoder",),
            donate_argnames=("variables", "opt_state"))
        self._jit_train_step_gather = jax.jit(
            self._train_step_gather, static_argnames=("train_encoder",),
            donate_argnames=("variables", "opt_state"))
        self._jit_train_chunk = jax.jit(
            self._train_chunk, static_argnames=("train_encoder",),
            donate_argnames=("variables", "opt_state"))
        self._jit_val_decode = jax.jit(self._val_decode)
        self._jit_val_decode_gather = jax.jit(self._val_decode_gather)

        # HBM-staged train pixels (VERDICT r3 #3): decode every image ONCE,
        # park the (N, S, S, 3) uint8 array on the mesh, and let the jitted
        # step gather its batch rows by index — the per-step host work drops
        # to caption/index planning (~KB uploads) and the soak stops running
        # the chip idle behind the 1-core decode loop.
        self._staged_images = None
        self._staged_val_images = None
        if cfg.device_resident_data:
            self._staged_images = self._stage_split(
                self.train_ds, self.train_loader, "train")
            # val pixels upload per batch EVERY epoch otherwise (~19 MB per
            # b64 batch through the relay); the val center crop is identical
            # to the host path for any image shape, so this is exact
            self._staged_val_images = self._stage_split(
                self.val_ds, self.val_loader, "val")

    # ------------------------------------------------------------------

    def _train_step(self, variables, opt_state, batch, lrs, epsilon, rng,
                    *, train_encoder: bool):
        rng_aug, rng_tf = jax.random.split(rng)
        images = self.augment(rng_aug, batch["images"])
        caps, lens = batch["captions"], batch["lengths"]   # (B, R, T), (B, R)
        bf16_train = self.cfg.precision == 16
        if bf16_train:
            # TPU-native AMP (reference: precision=16 at train.py:277): bf16
            # compute with fp32 master params — cast inside the loss so grads
            # flow back to fp32; matmuls accumulate fp32; no loss scaling
            # needed on TPU (bf16 exponent == fp32)
            images = images.astype(jnp.bfloat16)

        def loss_fn(params, images_c, caps_c, lens_c, bs, rng_c,
                    ce_scale, att_scale):
            cparams = params
            if bf16_train:
                cparams = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, params)
            vars_in = {"params": cparams, "state": {"batch_stats": bs}}
            if not train_encoder and self.cfg.frozen_encoder_eval:
                # frozen-phase eval-mode encoder (cfg.frozen_encoder_eval,
                # VERDICT r3 #5): inference path — running-stat BN, no
                # batch-stat updates, shufflenet permutation folding — under
                # stop_gradient.  Opt-in; the default matches the
                # reference's train-mode-BN frozen phase.
                annots = jax.lax.stop_gradient(
                    self.model.encode(vars_in, images_c, train=False))
                new_bs = bs
            else:
                annots, new_bs = self.model.encode(vars_in, images_c,
                                                   train=True)
                if not train_encoder:
                    annots = jax.lax.stop_gradient(annots)
            # grouped inline-loss scan: annotations stay (B, L, D) — never
            # repeated across the R reference captions and never
            # materializing (N, T, V) logits (the b256 HBM cliff fix)
            metrics = train_forward_loss_grouped(
                cparams["decoder"], self.cfg, annots, caps_c, lens_c, epsilon,
                rng_c, train=True)
            # ce_scale/att_scale re-weight a microbatch chunk's objective so
            # the SUM over chunks reproduces the full-batch loss exactly
            # (CE by valid-token share, att by 1/num_chunks); both are 1.0
            # on the unchunked path, where this is metrics["loss"].
            obj = (metrics["ce_loss"] * ce_scale
                   + self.cfg.att_gamma * metrics["att_loss"] * att_scale)
            return obj, (metrics, new_bs)

        mb = self.cfg.microbatch
        b_total = caps.shape[0]
        bs0 = variables["state"]["batch_stats"]
        if mb and 0 < mb < b_total and b_total % mb == 0:
            # In-step microbatching: scan the grad computation over
            # batch/microbatch chunks, summing gradients in fp32.  The
            # activation working set (encoder feature maps + the remat
            # decoder scan) stays at chunk size — at b256 the b64-chunk
            # step recovers the b64 cache-residency throughput while the
            # optimizer update and host round-trip still amortize over the
            # full batch.  Loss ≡ full batch: CE chunks are weighted by
            # n_valid_chunk / n_valid_total (the scan's own masked-token
            # count), the doubly-stochastic att term by 1/num_chunks.
            # BatchNorm normalizes per chunk (standard grad-accumulation
            # semantics, same as optax.MultiSteps / the reference's
            # Lightning accumulate_grad_batches).
            nchunks = b_total // mb
            num_steps = caps.shape[2] - 1
            total_valid = jnp.maximum(
                jnp.clip(lens, 0, num_steps).sum().astype(jnp.float32), 1.0)
            chunk = lambda x: x.reshape((nchunks, mb) + x.shape[1:])
            rngs = jax.random.split(rng_tf, nchunks)

            def chunk_step(carry, xs):
                grads_acc, bs = carry
                images_c, caps_c, lens_c, rng_c = xs
                n_valid_c = jnp.maximum(
                    jnp.clip(lens_c, 0, num_steps).sum().astype(jnp.float32),
                    1.0)
                g, (m, new_bs) = jax.grad(loss_fn, has_aux=True)(
                    variables["params"], images_c, caps_c, lens_c, bs, rng_c,
                    n_valid_c / total_valid, 1.0 / nchunks)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                row = jnp.stack([m["ce_loss"] * n_valid_c,
                                 m["accuracy"] * n_valid_c, m["att_loss"]])
                return (grads_acc, new_bs), row

            zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                           variables["params"])
            xs = (chunk(images), chunk(caps), chunk(lens), rngs)
            if nchunks <= 8:
                # Python-unrolled: XLA sees the whole chain and can overlap
                # chunk i's optimizer-side work with chunk i+1 (a lax.scan
                # boundary blocks that); compile cost scales with nchunks so
                # large counts fall back to the rolled loop
                carry, out_rows = (zeros, bs0), []
                for i in range(nchunks):
                    carry, row = chunk_step(
                        carry, jax.tree_util.tree_map(lambda x: x[i], xs))
                    out_rows.append(row)
                (grads, new_bs), rows = carry, jnp.stack(out_rows)
            else:
                (grads, new_bs), rows = jax.lax.scan(chunk_step, (zeros, bs0),
                                                     xs)
            ce = rows[:, 0].sum() / total_valid
            acc = rows[:, 1].sum() / total_valid
            att = rows[:, 2].mean()
            metrics = {"loss": ce + self.cfg.att_gamma * att, "ce_loss": ce,
                       "att_loss": att, "accuracy": acc}
        else:
            grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
                variables["params"], images, caps, lens, bs0, rng_tf,
                jnp.float32(1.0), jnp.float32(1.0))
        updates, opt_state = self.tx.update(grads, opt_state,
                                            variables["params"])
        updates = apply_group_lrs(updates, self.labels, lrs)
        params = optax.apply_updates(variables["params"], updates)
        return ({"params": params, "state": {"batch_stats": new_bs}},
                opt_state, metrics)

    def _train_step_gather(self, variables, opt_state, staged, idx, batch,
                           lrs, epsilon, rng, *, train_encoder: bool):
        """Device-resident variant: the batch carries (B,) dataset indices
        instead of pixels; the images gather from the HBM-staged array
        INSIDE the jitted step (an axis-0 take of contiguous rows — a
        batched dynamic-slice, bandwidth-bound and ~free at 9.6 MB/b64).
        Everything downstream is the literal _train_step, so the two feed
        paths share one set of train semantics (parity pinned by
        tests/test_device_resident.py)."""
        batch = dict(batch, images=jnp.take(staged, idx, axis=0))
        return self._train_step(variables, opt_state, batch, lrs, epsilon,
                                rng, train_encoder=train_encoder)

    def _train_chunk(self, variables, opt_state, staged, idxs, caps, lens,
                     lr_rows, epsilon, steps, *, train_encoder: bool):
        """S train steps in ONE dispatch (device-resident fast path).

        A per-step dispatch through the axon relay pays ~50 ms of RTT per
        ~4 ms b64 compute step (the first device-resident soak measured
        1.1k imgs/s — 13x off the pure step rate).  Scanning the chunk
        inside one jitted program amortizes the RTT over S steps; the
        chunk's indices/captions/LRs upload together (a few hundred KB).

        idxs (S, B) int32 rows into the staged pixel array; caps
        (S, B, R, T) already trimmed to the chunk max; lr_rows (S, 3) fp32
        in schedules.GROUPS order (encoder column pre-zeroed while frozen);
        steps (S,) int32 global step numbers — the per-step rng stays the
        same pure fold_in(seed_base, global_step) the per-step path uses,
        so the two paths train bit-identically."""
        from .schedules import GROUPS

        def body(carry, xs):
            variables, opt_state = carry
            idx, cap, ln, lr_row, step = xs
            batch = {"images": jnp.take(staged, idx, axis=0),
                     "captions": cap, "lengths": ln}
            lrs = {g: lr_row[i] for i, g in enumerate(GROUPS)}
            rng = jax.random.fold_in(self._step_rng_base, step)
            variables, opt_state, metrics = self._train_step(
                variables, opt_state, batch, lrs, epsilon, rng,
                train_encoder=train_encoder)
            if not hasattr(self, "_metric_keys"):
                self._metric_keys = tuple(sorted(metrics))
            packed = jnp.stack([metrics[k] for k in self._metric_keys])
            return (variables, opt_state), packed

        (variables, opt_state), rows = jax.lax.scan(
            body, (variables, opt_state), (idxs, caps, lens, lr_rows, steps))
        return variables, opt_state, rows

    def _stage_split(self, ds, loader, tag: str):
        """Decode a whole split once into one pinned uint8 array and place
        it replicated on the mesh (train: 16k x 224^2 x 3 = 2.4 GB in a
        16 GB v5e; val adds ~77 MB).  Bit-exact vs the host loader when
        images decode to exactly (S, S) — the synthetic soak tasks render
        at input_size, so the loader's random crop was already the
        identity; anything larger gets ONE center crop here (for val that
        IS the host path's crop; for train the per-epoch crop translation
        is lost, and a warning says so)."""
        from ..data.dataset import square_crop
        from ..parallel.mesh import replicate_tree
        S = self.cfg.input_size
        n = len(ds)
        staged = np.empty((n, S, S, 3), np.uint8)
        t0 = time.time()
        n_cropped = 0
        for i in range(n):
            arr = loader._decode_full(ds.img_paths[i])
            if arr.shape[:2] != (S, S):
                n_cropped += 1
                arr = square_crop(arr, S)
            staged[i] = arr
            if i and i % 4096 == 0:
                print(f"  staging {i}/{n} {tag} images "
                      f"({i / (time.time() - t0):.0f}/s)", flush=True)
        if n_cropped and tag == "train":
            print(f"WARNING: {n_cropped}/{n} train images were larger than "
                  f"{S}x{S}; device_resident staged a fixed center crop — "
                  f"per-epoch crop translation is lost for those images")
        dev = replicate_tree(staged, self.mesh)
        dev.block_until_ready()
        print(f"device-resident staging: {n} {tag} images "
              f"({staged.nbytes / 1e9:.2f} GB uint8) decoded + uploaded in "
              f"{time.time() - t0:.1f}s", flush=True)
        return dev

    def _device_resident_stream(self):
        """The _upload_stream analogue for staged pixels: same epoch plan
        (bucket order, caption trims, mid-epoch-resume skip — straight from
        CaptionLoader.batch_plans), but each yielded batch is {image_idx,
        captions, lengths} — a few KB — instead of ~10 MB of pixels."""
        loader = self.train_loader
        for idxs, trim, _stream in loader.batch_plans():
            caps = self.train_ds.encoded_captions[list(idxs)]
            lens = self.train_ds.lengths[list(idxs)]
            if loader.trim_captions:
                caps = caps[:, :, :(trim if trim is not None
                                    else loader._trim_len(idxs))]
            batch = {"image_idx": np.asarray(idxs, np.int32),
                     "captions": caps, "lengths": lens}
            yield shard_batch(batch, self.mesh), len(idxs)

    def _val_decode(self, variables, images):
        images = val_preprocess(images)
        annots = self.model.encode(variables, images, train=False)
        return beam_search(variables["params"]["decoder"], self.cfg, annots,
                           beamk=self.cfg.val_beamk,
                           max_gen_length=self.cfg.val_max_len,
                           temperature=1.0, rescore_method="LN",
                           early_exit=self.cfg.val_early_exit)

    def _val_decode_gather(self, variables, staged, idx):
        """Device-resident val: gather the batch from staged pixels by
        index — per-epoch val stops re-uploading ~19 MB/batch of pixels
        through the relay."""
        return self._val_decode(variables, jnp.take(staged, idx, axis=0))

    # ------------------------------------------------------------------

    def _checkpoint_tree(self) -> Dict[str, Any]:
        tree = {"params": self.variables["params"],
                "state": self.variables["state"],
                "opt_state": self.opt_state,
                "step": self.global_step, "epoch": self.current_epoch,
                "scheduler": dict(self.scheduler.state_dict()),
                "early_stop": {"best": (self.early_stop_best
                                        if self.early_stop_best is not None
                                        else float("-inf")),
                               "count": self.early_stop_count}}
        # fetch_tree_packed: ONE device->host transfer for the whole tree
        # (the per-leaf path cost 22-35 s per checkpoint through the relay —
        # ~95% of soak validation wall-time; see EXPERIMENTS.md round 5).
        # Multi-host + vocab-TP leaves aren't addressable from one process
        # and keep the per-leaf allgather inside (a collective — every
        # process must call _checkpoint_tree together, which the
        # deterministic trigger conditions guarantee).
        tree = fetch_tree_packed(tree)
        # top-k registry rides along so resuming from ANY checkpoint kind
        # (restart-{step}, last, top-k) restores save_top_k enforcement;
        # TopKCheckpointManager overwrites this with its post-update state
        # for the files it writes itself
        tree["top_k"] = self.ckpt.state_dict()
        return tree

    def _flush_train_metrics(self, pending, epsilon, timer, epoch_metrics):
        """Fetch a BUFFER of per-step metrics in one device round-trip.

        Each entry is (packed (M,) device array, step, n_images).  Per-step
        device_get costs one relay RTT; at ~14 ms compute steps the RTT
        dominated the whole epoch (soak r2: ~60 s/epoch of pure fetch).  The
        packed rows are stacked on device and fetched as ONE array; every
        step's scalars still reach the logger with its own step number."""
        if not pending:
            return
        rows = np.asarray(jnp.stack([p[0] for p in pending]))   # one fetch
        n_total = sum(p[2] for p in pending)
        timer.tick(n_total)
        rate = timer.images_per_sec
        for (_, step, _), vals in zip(pending, rows):
            host = dict(zip(self._metric_keys, (float(v) for v in vals)))
            host["epsilon_tf"] = float(epsilon)
            if rate:
                host["images_per_sec"] = rate
            self.logger.train_step(host, step)
            epoch_metrics.append(host)
        pending.clear()

    def _upload_stream(self, loader):
        """Iterate (device_batch, n_local_rows): host->device upload runs in
        a worker thread one batch ahead, overlapping the relay transfer
        (~10 MB/step of pixels) with the previous step's compute."""
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()
        _END = object()

        def put(item) -> bool:
            """Blocking put that aborts when the consumer is gone — EVERY
            producer put goes through here (including _END and the error
            path), or an abandoned epoch (max_batches, a step exception)
            leaves the thread blocked forever on the full queue, pinning
            its uploaded device batches for the life of the process."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in loader:
                    n = batch["images"].shape[0]
                    if not put((shard_batch(batch, self.mesh), n)):
                        return
                put(_END)
            except BaseException as e:  # surface loader/upload errors
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=1.0)
                except queue.Empty:
                    if not t.is_alive():
                        raise RuntimeError("upload producer thread died")
                    continue
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=10)

    def _train_epoch_chunked(self, max_batches: Optional[int] = None
                             ) -> Dict[str, float]:
        """Device-resident epoch in steps_per_dispatch-sized scan chunks.

        Bookkeeping parity with the per-step loop: the scheduler is stepped
        per batch on host while building each chunk's LR rows (exact same
        call sequence), metrics arrive as one (S, M) array per chunk and
        flush through the same buffered path, and a chunk never straddles
        the encoder-unfreeze boundary (the train_encoder recompile edge).
        Restart-on-LR-increase checkpoints are checked once per chunk."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..utils.timing import StepTimer
        from .schedules import GROUPS
        cfg = self.cfg
        loader = self.train_loader
        epoch_metrics: List[Dict[str, float]] = []
        epsilon = teacher_forcing_epsilon(cfg, self.current_epoch)
        eps_dev = jnp.asarray(epsilon, jnp.float32)
        enc_on = (cfg.encoder_finetune_after > 0 and cfg.encoder_lr > 0)
        timer = StepTimer()
        pending: List[Any] = []
        flush_n = max(1, cfg.log_every)
        loader.set_epoch(self.current_epoch,
                         skip_batches=self._resume_skip_batches)
        self._resume_skip_batches = 0
        plans = loader.batch_plans()
        if max_batches is not None:
            plans = plans[:max_batches]
        trims_all = [(trim if trim is not None else loader._trim_len(idxs))
                     if loader.trim_captions
                     else self.train_ds.encoded_captions.shape[2]
                     for idxs, trim, _ in plans]
        # batch axis (dim 1 of the stacked chunk arrays) sharded over every
        # mesh axis, step axis replicated — the chunk analogue of
        # parallel/mesh.data_sharding (incl. its GSPMD grouped-conv note)
        sh_b1 = NamedSharding(self.mesh, P(None, self.mesh.axis_names))
        i = 0
        # decoder LR of the last dispatched step, threaded across chunks AND
        # epochs so an LR increase landing exactly on a chunk or epoch
        # boundary is still seen (ADVICE r4: restart detection must not
        # depend on where chunks cut)
        prev_dec_lr: Optional[float] = getattr(self, "_chunk_prev_dec_lr",
                                               None)
        while i < len(plans):
            n = min(max(1, cfg.steps_per_dispatch), len(plans) - i)
            gs0 = self.global_step
            if enc_on and gs0 < cfg.encoder_finetune_after < gs0 + n:
                n = cfg.encoder_finetune_after - gs0  # recompile boundary
            # uniform caption trim within a chunk: the TF coin / dropout-rng
            # draws are shaped (T-1,), so padding a batch to a LARGER T
            # would change its random stream vs the per-step path and break
            # bit-exact parity.  Bucketed epochs emit trims in monotone
            # runs, so this costs only a few extra chunk boundaries.
            T = trims_all[i]
            for j in range(1, n):
                if trims_all[i + j] != T:
                    n = j
                    break
            train_encoder = enc_on and gs0 >= cfg.encoder_finetune_after
            # exact per-step LR replay: same current_lrs / on_train_batch_end
            # interleaving the per-step loop performs.  Computed BEFORE the
            # data stacking because an LR increase can shorten the chunk.
            lr_rows = np.empty((n, len(GROUPS)), np.float32)
            for j in range(n):
                lrs = self.scheduler.current_lrs(gs0 + j)
                if not train_encoder:
                    lrs = dict(lrs, encoder=0.0)
                lr_rows[j] = [lrs[g] for g in GROUPS]
                self.scheduler.on_train_batch_end(gs0 + j)
                # Cut the chunk at a scheduled LR increase (ADVICE r4): the
                # increase step becomes the chunk's LAST row, so the
                # restart snapshot below sees chunk-end params after exactly
                # one increased-LR update — the per-step path's semantics —
                # instead of up to steps_per_dispatch-1 of them, and a
                # rise-and-fall can never complete invisibly inside a
                # chunk.  The scheduler has been stepped exactly j+1 times
                # here, matching the truncated chunk — no rewind needed.
                # Warmup's monotone ramp is exempt (the restart manager
                # ignores steps <= its warmup_steps anyway).
                last = lr_rows[j - 1][0] if j > 0 else prev_dec_lr
                if (gs0 + j > self.restart_ckpt.warmup_steps
                        and last is not None and lr_rows[j][0] > last
                        and j + 1 < n):
                    n = j + 1
                    lr_rows = lr_rows[:n]
                    break
            prev_dec_lr = float(lr_rows[n - 1][0])
            self._chunk_prev_dec_lr = prev_dec_lr
            chunk = plans[i:i + n]
            i += n
            idx_arr = np.stack([np.asarray(idxs, np.int32)
                                for idxs, _, _ in chunk])
            caps = np.stack([self.train_ds.encoded_captions[list(idxs)][:, :, :T]
                             for idxs, _, _ in chunk])
            lens = np.stack([self.train_ds.lengths[list(idxs)]
                             for idxs, _, _ in chunk])
            steps = np.arange(gs0, gs0 + n, dtype=np.int32)
            put1 = lambda x: jax.device_put(x, sh_b1)
            self.variables, self.opt_state, rows = self._jit_train_chunk(
                self.variables, self.opt_state, self._staged_images,
                put1(idx_arr), put1(caps), put1(lens),
                jnp.asarray(lr_rows), eps_dev, jnp.asarray(steps),
                train_encoder=train_encoder)
            b = idx_arr.shape[1]
            for j in range(n):
                pending.append((rows[j], gs0 + j, b))
            self.global_step = gs0 + n
            if len(pending) >= flush_n:
                self._flush_train_metrics(pending, epsilon, timer,
                                          epoch_metrics)
            # Per-step restart parity (ADVICE r4): chunks are cut at LR
            # increases above, so within a chunk LR is non-increasing and
            # the only step the per-step manager could fire on is the
            # chunk's LAST row.  Its prev at that point is the
            # second-to-last row — seed the manager with it (for a 1-row
            # chunk the manager's own stored prev, the previous chunk's
            # last LR, is already the per-step prev).
            if n >= 2:
                self.restart_ckpt.prev_lr = float(lr_rows[-2][0])
            self.restart_ckpt.on_train_batch_end(
                cfg, self._checkpoint_tree, self.global_step,
                float(lr_rows[-1][0]))
        self._flush_train_metrics(pending, epsilon, timer, epoch_metrics)
        means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                 for k in epoch_metrics[0]} if epoch_metrics else {}
        self.scheduler.on_train_epoch_end(self.current_epoch)
        self.logger.train_epoch(
            means, self.current_epoch,
            lr=self.scheduler.current_lrs(self.global_step)["decoder"])
        return means

    def train_epoch(self, max_batches: Optional[int] = None) -> Dict[str, float]:
        """One epoch.  max_batches stops early after that many steps — a
        controlled stand-in for an interruption (tests) or a quick profile."""
        from ..utils.timing import StepTimer
        if self._staged_images is not None and self.cfg.steps_per_dispatch > 1:
            return self._train_epoch_chunked(max_batches)
        cfg = self.cfg
        epoch_metrics: List[Dict[str, float]] = []
        epsilon = teacher_forcing_epsilon(cfg, self.current_epoch)
        enc_on = (cfg.encoder_finetune_after > 0 and cfg.encoder_lr > 0)
        timer = StepTimer()
        pending: List[Any] = []
        flush_n = max(1, cfg.log_every)
        done = 0
        # data order/augs become a pure fn of (seed, epoch) -> resume replays;
        # mid-epoch resume skips already-trained batches inside the loader,
        # before any image decode (ADVICE r1, low)
        self.train_loader.set_epoch(self.current_epoch,
                                    skip_batches=self._resume_skip_batches)
        self._resume_skip_batches = 0
        stream = (self._device_resident_stream()
                  if self._staged_images is not None
                  else self._upload_stream(self.train_loader))
        for dbatch, n_local in stream:
            if max_batches is not None and done >= max_batches:
                break
            done += 1
            lrs = self.scheduler.current_lrs(self.global_step)
            train_encoder = (enc_on
                             and self.global_step >= cfg.encoder_finetune_after)
            if not train_encoder:
                lrs = dict(lrs, encoder=0.0)
            # per-step rng is a pure function of (seed, global_step): a
            # resumed run replays the exact augmentation/TF randomness the
            # uninterrupted run would have used (bit-exact resume)
            step_rng = jax.random.fold_in(self._step_rng_base,
                                          self.global_step)
            lrs_dev = {k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()}
            eps_dev = jnp.asarray(epsilon, jnp.float32)
            if self._staged_images is not None:
                idx = dbatch["image_idx"]
                rest = {k: v for k, v in dbatch.items() if k != "image_idx"}
                self.variables, self.opt_state, metrics = \
                    self._jit_train_step_gather(
                        self.variables, self.opt_state, self._staged_images,
                        idx, rest, lrs_dev, eps_dev, step_rng,
                        train_encoder=train_encoder)
            else:
                self.variables, self.opt_state, metrics = \
                    self._jit_train_step(
                        self.variables, self.opt_state, dbatch, lrs_dev,
                        eps_dev, step_rng, train_encoder=train_encoder)

            # buffered metric fetch: each step's scalars are packed into ONE
            # tiny device array (async dispatch) and fetched log_every steps
            # later in a single round-trip — the host never blocks per step
            # (the reference's per-step TB logging forces a GPU sync every
            # batch; through the axon relay a per-step fetch costs one RTT,
            # which dominated soak epochs)
            if not hasattr(self, "_metric_keys"):
                self._metric_keys = tuple(sorted(metrics))
            packed = jnp.stack([metrics[k] for k in self._metric_keys])
            pending.append((packed, self.global_step,
                            n_local * jax.process_count()))
            if len(pending) >= flush_n:
                self._flush_train_metrics(pending, epsilon, timer,
                                          epoch_metrics)
            self.scheduler.on_train_batch_end(self.global_step)
            # increment BEFORE the restart snapshot: params already include
            # this step's update, and resume treats the stored step as
            # next-to-run — saving the pre-increment step would replay (and
            # double-apply) the batch just trained (ADVICE.md r1, high)
            self.global_step += 1
            self.restart_ckpt.on_train_batch_end(
                cfg, self._checkpoint_tree, self.global_step, lrs["decoder"])
        self._flush_train_metrics(pending, epsilon, timer, epoch_metrics)
        means = {k: float(np.mean([m[k] for m in epoch_metrics]))
                 for k in epoch_metrics[0]} if epoch_metrics else {}
        self.scheduler.on_train_epoch_end(self.current_epoch)
        self.logger.train_epoch(
            means, self.current_epoch,
            lr=self.scheduler.current_lrs(self.global_step)["decoder"])
        return means

    def _fetch_beam_no_alphas(self, res):
        """device_get a BeamResult WITHOUT its alphas: validation scoring
        never reads attention maps, and the (B, k, T, L) fp32 block is the
        largest fetch of the val loop (~750 KB/batch at b64 beam-3 through
        the relay).  The multi-host allgather path has always skipped them
        (zeros stand in); this applies the same trick single-process."""
        tokens, lengths, raw, scores, ppl = jax.device_get(
            (res.tokens, res.lengths, res.raw_scores, res.scores,
             res.perplexity))
        return type(res)(
            tokens=tokens, lengths=lengths, raw_scores=raw, scores=scores,
            perplexity=ppl,
            alphas=np.zeros(lengths.shape + res.alphas.shape[2:],
                            np.float32))

    def validate(self) -> Dict[str, float]:
        cfg = self.cfg
        n_batches = len(self.val_loader)
        limit = max(1, int(round(cfg.val_percent * n_batches)))
        batch_metrics: List[Dict[str, float]] = []
        # itemized wall-time buckets (VERDICT r4 #3: the soak ladder's epoch
        # time is ~90% validation — make its components visible)
        tm = {"embed_fetch": 0.0, "decode_fetch": 0.0, "score": 0.0,
              "data": 0.0}
        t0 = time.time()
        # fetch_global: under multi-host vocab-TP the embedding spans hosts
        embedding = np.asarray(fetch_global(
            self.variables["params"]["decoder"]["embedding"]))
        tm["embed_fetch"] = time.time() - t0
        n_dev = self.mesh.devices.size
        n_proc = jax.process_count()
        self.val_loader.set_epoch(self.current_epoch)
        staged_val = self._staged_val_images
        source = (self.val_loader.batch_plans() if staged_val is not None
                  else self.val_loader)
        for i, item in enumerate(source):
            if i >= limit:
                break
            if staged_val is not None:
                # device-resident val (single-process): indices upload, the
                # pixels are already in HBM; scoring reads the refs straight
                # from the dataset arrays
                idxs = list(item[0])
                n = len(idxs)
                refs_c = self.val_ds.encoded_captions[idxs]
                refs_l = self.val_ds.lengths[idxs]
                if n % n_dev:  # pad tail to the mesh size, slice after
                    idxs = idxs + [idxs[-1]] * (-n % n_dev)
                idx_dev = shard_batch(np.asarray(idxs, np.int32), self.mesh)
                t0 = time.time()
                res = self._fetch_beam_no_alphas(self._jit_val_decode_gather(
                    self.variables, staged_val, idx_dev))
                tm["decode_fetch"] += time.time() - t0
                t0 = time.time()
                caps, _, _, ppl = unpack_beam_result(
                    res, self.model.grid_hw, return_all=False)
                caps, ppl = caps[:n], ppl[:n]
                m = score_captions(caps, refs_c[:n], refs_l[:n],
                                   embedding=embedding, perplexities=ppl)
                tm["score"] += time.time() - t0
                batch_metrics.append(m)
                continue
            batch = item
            n = batch["images"].shape[0]
            t0 = time.time()
            if n_proc == 1 and n % n_dev:
                # pad tail batch to the mesh size, slice after decode
                # (multi-host loaders drop the tail, so batches stay full)
                pad = -n % n_dev
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                         for k, v in batch.items()}
            dbatch = shard_batch(batch, self.mesh)
            tm["data"] += time.time() - t0
            t0 = time.time()
            res = self._jit_val_decode(self.variables, dbatch["images"])
            if n_proc > 1:
                # every host scores the full global batch: allgather the
                # decode results and the reference captions — except the
                # (B,k,T,L) alphas, which scoring never reads (zeros stand in)
                from jax.experimental import multihost_utils

                def gather(x):
                    return np.asarray(
                        multihost_utils.process_allgather(x, tiled=True))
                lens = gather(res.lengths)
                res = type(res)(
                    tokens=gather(res.tokens), lengths=lens,
                    raw_scores=gather(res.raw_scores),
                    scores=gather(res.scores),
                    perplexity=gather(res.perplexity),
                    alphas=np.zeros(lens.shape + res.alphas.shape[2:],
                                    np.float32))
                refs_c = gather(batch["captions"])
                refs_l = gather(batch["lengths"])
                n = refs_c.shape[0]
            else:
                res = self._fetch_beam_no_alphas(res)
                refs_c, refs_l = batch["captions"], batch["lengths"]
            tm["decode_fetch"] += time.time() - t0
            t0 = time.time()
            caps, _, _, ppl = unpack_beam_result(
                res, self.model.grid_hw, return_all=False)
            caps, ppl = caps[:n], ppl[:n]
            m = score_captions(caps, refs_c[:n], refs_l[:n],
                               embedding=embedding, perplexities=ppl)
            tm["score"] += time.time() - t0
            batch_metrics.append(m)
        means = {k: float(np.mean([m[k] for m in batch_metrics]))
                 for k in batch_metrics[0]} if batch_metrics else {}
        self.logger.val_epoch(means, self.current_epoch)
        # plateau scheduler steps on the monitored metric (model.py:716-718)
        if cfg.plateau_monitor in means:
            self.scheduler.on_validation_end(means[cfg.plateau_monitor],
                                             self.global_step)
        # checkpoint top-k + last (train.py:180-188) — timed separately: a
        # top-k save fetches the full param tree through the relay and
        # writes ~the checkpoint size to disk, and during a quality
        # inflection it fires EVERY epoch
        t0 = time.time()
        self.ckpt.on_validation_end(cfg, self._checkpoint_tree, means,
                                    self.current_epoch, self.global_step)
        tm["ckpt"] = time.time() - t0
        self.last_val_timings = tm
        # early stopping (train.py:195-203, mode max)
        if cfg.early_stop_monitor is not None:
            v = means.get(cfg.early_stop_monitor, float("-inf"))
            if self.early_stop_best is None or v > self.early_stop_best:
                self.early_stop_best = v
                self.early_stop_count = 0
            else:
                self.early_stop_count += 1
                if self.early_stop_count >= cfg.early_stop_patience:
                    self.should_stop = True
        return means

    def fit(self) -> Dict[str, float]:
        from ..utils.timing import maybe_profile
        last_val: Dict[str, float] = {}
        first_epoch = self.current_epoch
        for epoch in range(first_epoch, self.cfg.epochs):
            self.current_epoch = epoch
            t0 = time.time()
            with maybe_profile(self.cfg.profile_dir if epoch == first_epoch
                               else None):
                train_means = self.train_epoch()
            if (epoch + 1) % self.cfg.val_interval == 0:
                last_val = self.validate()
            dt = time.time() - t0
            print(f"epoch {epoch}: loss={train_means.get('loss', float('nan')):.4f} "
                  f"acc={train_means.get('accuracy', 0):.4f} "
                  f"bleu4={last_val.get('bleu4', 0):.4f} ({dt:.1f}s)")
            if self.should_stop:
                break
        # final save_last refresh (tree gathered on all processes; one writer)
        tree = self._checkpoint_tree()
        if self.is_main:
            save_checkpoint(os.path.join(self.logdir, "last.ckpt"), self.cfg,
                            tree)
        self.logger.close()
        return last_val
