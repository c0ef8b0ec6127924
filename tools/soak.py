"""COCO-scale realistic training soak (VERDICT r1 next-round item #6).

Generates a reference-shaped dataset — N 640x480 JPEGs (quality 85, the COCO
file shape the native libjpeg pipeline targets) with 5 reference captions per
image over a production-size vocabulary — then runs the REAL Trainer for
multiple epochs on the attached TPU: bucketed bf16 training with per-epoch
beam validation, a mid-soak checkpoint/resume exercise, and a steady-state
imgs/s + epoch-time + recompile-count report (the analogue of the reference's
32k-image x 90-epoch runs, dev/presentation.txt:122-128).

Usage (from the repo root):
    python tools/soak.py --n 16384 --epochs 10 [--batch 64] [--out /tmp/soak]

Appends a markdown results table to stdout; paste into EXPERIMENTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_soak_dataset(out_dir: str, n_train: int, n_val: int, vocab_words: int,
                      seed: int = 0, width: int = 640, height: int = 480,
                      max_cap_length: int = 26) -> str:
    """N JPEGs + reference-schema JSON.  Images are gradient+noise (so JPEG
    entropy is COCO-like, not white-noise worst-case); captions are
    length-distributed like COCO's (6..max words)."""
    from PIL import Image
    from sat_tpu.vocab import Vocab
    from collections import Counter

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "imgs")
    os.makedirs(img_dir, exist_ok=True)

    words = [f"word{i:04d}" for i in range(vocab_words)]
    vocab = Vocab.build(Counter({w: 100 for w in words}), min_count=1,
                        max_vocab=None)
    # zipf-ish draw so batches have realistic repeated-token structure
    probs = 1.0 / (np.arange(1, vocab_words + 1) ** 0.8)
    probs /= probs.sum()

    yy, xx = np.mgrid[0:height, 0:width]

    def write_image(path, i):
        base = (np.stack([(xx * (i % 7 + 1)) % 256, (yy * (i % 5 + 1)) % 256,
                          ((xx + yy) * (i % 3 + 1)) % 256], -1)
                .astype(np.float32))
        noise = nprng.normal(0, 18, size=(height, width, 3))
        arr = np.clip(base + noise, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(path, quality=85)

    def make_split(n, tag):
        img_paths, caps, lens = [], [], []
        t0 = time.time()
        for i in range(n):
            path = os.path.join(img_dir, f"{tag}_{i}.jpg")
            if not os.path.exists(path):
                write_image(path, i)
            img_paths.append(path)
            ic, il = [], []
            for _ in range(5):
                n_words = min(rng.randint(6, max_cap_length), max_cap_length)
                toks = [words[j] for j in
                        nprng.choice(vocab_words, n_words, p=probs)]
                ic.append(vocab.encode(toks, max_cap_length))
                il.append(n_words + 1)
            caps.append(ic)
            lens.append(il)
            if i and i % 4096 == 0:
                print(f"  {tag}: {i}/{n} images ({i/(time.time()-t0):.0f}/s)",
                      file=sys.stderr)
        return {"samples": n, "img_paths": img_paths,
                "encoded_captions": caps, "lengths": lens}

    output = {"vocab_stoi": vocab.stoi_map, "vocab_size": vocab.size,
              "embed_dim": None, "pretrained_embedding": None, "min_count": 1,
              "max_cap_length": max_cap_length,
              "train": make_split(n_train, "train"),
              "val": make_split(n_val, "val"),
              "test": make_split(max(n_val // 2, 8), "test")}
    path = os.path.join(out_dir, "soak.json")
    json.dump(output, open(path, "w"))
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", default=16384, type=int)
    p.add_argument("--n_val", default=512, type=int)
    p.add_argument("--vocab", default=4096, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--batch", default=64, type=int)
    p.add_argument("--arch", default="shufflenet_v2_x0_5")
    p.add_argument("--out", default="/tmp/sat_soak")
    p.add_argument("--workers", default=2, type=int)
    p.add_argument("--resume_at", default=5, type=int,
                   help="epoch after which to checkpoint + rebuild the "
                        "Trainer from the checkpoint (mid-soak resume drill)")
    p.add_argument("--learnable", action="store_true",
                   help="use the SOLVABLE color-caption task instead of "
                        "random captions: same production model config, but "
                        "BLEU-4 must converge toward 1.0 — the at-scale "
                        "quality-evidence run")
    p.add_argument("--nouns", default=None, type=int, metavar="N",
                   help="with --compositional: restrict the lexicon to the "
                        "first N of the 1,024 (color x shape x texture) "
                        "nouns — the learnability ladder (v2 showed 1,024 "
                        "nouns x 32 sightings each is too sparse for a "
                        "from-scratch encoder in a soak-length run)")
    p.add_argument("--colors", default=1, type=int, metavar="K",
                   help="with --compositional --nouns N: span the lexicon "
                        "across K colors (N/K shape-texture combos each, "
                        "data/compositional.py::color_diverse_nouns) — the "
                        "contiguous first-N slice is single-color, so no "
                        "rung before round 4 ever exercised color binding")
    p.add_argument("--obj_scale", default=1.0, type=float,
                   help="with --compositional: scale rendered object radii "
                        "(clamped to the grid cell) — tests the 'textures "
                        "render too small to read' WHAT-binding hypothesis")
    p.add_argument("--input_size", default=224, type=int,
                   help="image render + model input size (the other "
                        "resolution lever for the WHAT-binding hypothesis)")
    p.add_argument("--compositional", action="store_true",
                   help="use the compositional caption grammar "
                        "(sat_tpu/data/compositional.py): 2-object scenes, "
                        "~1,070-word vocab, 8-18 token captions, 5 paraphrase "
                        "refs — the COCO-statistics stand-in; the report "
                        "prints the no-image prior-baseline BLEU floor")
    p.add_argument("--device_resident", action="store_true",
                   help="stage the whole train split in HBM once (uint8) "
                        "and gather batches by index inside the jitted "
                        "step — removes the 1-core host decode/upload "
                        "bottleneck that ran the chip ~98%% idle (soaks "
                        "v2-v5 measured 178-355 imgs/s vs 20k+ device-"
                        "resident). Bit-exact vs the host path for the "
                        "224px synthetic tasks (tests/test_device_resident)")
    p.add_argument("--val_every", default=1, type=int, metavar="N",
                   help="validate every N epochs (and always on the final "
                        "one).  With device-resident training at ~1.5 "
                        "s/epoch, beam validation (~15 s) dominates the "
                        "soak wall-clock; long rungs (the 1024-noun phase-"
                        "transition hunt) thin it out")
    p.add_argument("--frozen_encoder", action="store_true",
                   help="train with the encoder FROZEN at init (the de-facto "
                        "behavior of every round-3/4 rung: "
                        "encoder_finetune_after=0 builds no encoder "
                        "optimizer group).  Kept as an opt-out for A/Bs "
                        "against the old rungs; default now finetunes from "
                        "step 1.")
    p.add_argument("--steps_per_dispatch", default=None, type=int,
                   help="with --device_resident: train steps per jitted "
                        "scan dispatch (default: config's 32)")
    p.add_argument("--save_best", default=None, metavar="PATH",
                   help="save a full checkpoint of the best-bleu4 epoch "
                        "(feeds bench.py --checkpoint serving measurements)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="continue a finished soak from a saved checkpoint: "
                        "optimizer/scheduler/epoch counters restore from the "
                        "file and --epochs MORE epochs run on top (the curve "
                        "extends; epoch numbers print absolute)")
    p.add_argument("--best_floor", default=-1.0, type=float,
                   help="with --resume + --save_best: only save checkpoints "
                        "that beat this bleu4 (the prior run's best), so a "
                        "worse continuation never clobbers a better file")
    a = p.parse_args(argv)

    t0 = time.time()
    if a.compositional:
        from sat_tpu.data.compositional import (N_NOUNS, color_diverse_nouns,
                                                make_compositional_dataset,
                                                prior_baseline_bleu)
        nouns = a.nouns or N_NOUNS
        name = ("compositional" if nouns == N_NOUNS
                else f"compositional_{nouns}")
        # rung-keyed name: every generation axis that changes pixels or
        # captions lands in the filename, so rungs never collide in out/
        if a.colors > 1:
            name += f"_c{a.colors}"
        if a.obj_scale != 1.0:
            name += f"_x{a.obj_scale:g}"
        if a.input_size != 224:
            name += f"_s{a.input_size}"
        json_path = os.path.join(a.out, f"{name}.json")
        if not os.path.exists(json_path):
            print(f"generating {a.n} compositional {a.input_size}px scenes "
                  f"({nouns} nouns, {a.colors} colors, "
                  f"obj_scale {a.obj_scale:g}) ...", file=sys.stderr)
            json_path = make_compositional_dataset(
                a.out, n_train=a.n, n_val=a.n_val,
                n_test=max(a.n_val // 2, 8), image_size=a.input_size,
                n_nouns=nouns, json_name=name,
                noun_ids=(color_diverse_nouns(nouns, a.colors)
                          if a.colors > 1 else None),
                obj_scale=a.obj_scale)
        floor = prior_baseline_bleu(json_path)
        print("no-image prior baseline: "
              + " ".join(f"{k}={v:.4f}" for k, v in floor.items()),
              file=sys.stderr)
    elif a.learnable:
        from sat_tpu.data.preprocess import make_learnable_dataset
        json_path = os.path.join(a.out, "colors.json")
        if not os.path.exists(json_path):
            print(f"generating {a.n} learnable 224px images ...",
                  file=sys.stderr)
            json_path = make_learnable_dataset(
                a.out, n_train=a.n, n_val=a.n_val,
                n_test=max(a.n_val // 2, 8), image_size=224,
                json_name="colors")
    else:
        json_path = os.path.join(a.out, "soak.json")
        if not os.path.exists(json_path):
            print(f"generating {a.n}+{a.n_val} 640x480 JPEGs ...",
                  file=sys.stderr)
            json_path = make_soak_dataset(a.out, a.n, a.n_val, a.vocab)
    print(f"dataset ready in {time.time()-t0:.0f}s", file=sys.stderr)

    from sat_tpu.config import SATConfig
    from sat_tpu.train.loop import Trainer

    cfg = SATConfig(
        json=json_path, name="soak", batch=a.batch, epochs=a.epochs,
        precision=16, encoder_arch=a.arch, input_size=a.input_size,
        embed_dim=256, attention_dim=128, decoder_dim=512, deep_output=True,
        decoder_tf="inv_sigmoid", decoder_tf_min=0.75, label_smoothing=0.1,
        bucket_sampler=True, workers=a.workers,
        # =1, not 0: with 0 the optimizer has NO encoder group (reference
        # model.py:745-746) — every round-3/4 rung unknowingly trained with
        # a frozen random-init encoder (round-5 discovery; the likely cause
        # of shape/texture binding never emerging: color/position are
        # linearly decodable from random conv features, shape/texture need
        # trained filters).  --frozen_encoder restores the old behavior.
        encoder_finetune_after=(0 if a.frozen_encoder else 1),
        encoder_lr=1e-4,
        scheduler="plateau", plateau_monitor="bleu4",
        # last.ckpt refresh every 8 vals: on non-improving epochs nothing is
        # written and the full-tree fetch is skipped entirely (the fetch was
        # ~95% of val wall-time pre-pack; the pack made it 4 s, this makes
        # most epochs ~0)
        save_last_every=8,
        val_interval=1, val_percent=0.25, val_beamk=3, val_max_len=20,
        val_early_exit=True, clip_value=5.0, grad_clip="norm", seed=0)
    if a.compositional or a.learnable:
        # The synthetic 224px tasks are subset-scale (16k x 147 KB decoded
        # ~= 2.4 GB in a 125 GB host) and the 1-core container is
        # decode-bound (soak v2 measured the chip ~90% idle at 178 imgs/s):
        # cache_images keeps the decoded pre-crop arrays in RAM so epochs 2+
        # skip the PNG decode entirely (crop randomness stays per-epoch).
        cfg = cfg.replace(cache_images=True)
    if a.device_resident:
        # benchmark=True switches on the persistent XLA compilation cache
        # (Trainer maps the reference's cudnn.benchmark flag onto it): the
        # chunked-scan programs cost ~26 min of cold compile per soak
        # process, and ladder rungs reuse the same shapes
        cfg = cfg.replace(device_resident_data=True, benchmark=True)
    if a.steps_per_dispatch:
        cfg = cfg.replace(steps_per_dispatch=a.steps_per_dispatch)
    if a.compositional:
        # The grammar's captions name grid POSITIONS; the default hflip
        # augmentation mirrors the image without relabeling, corrupting
        # every left/right word 50% of the time.  Soak v1 (EXPERIMENTS.md)
        # showed the model responding rationally: it converged onto the one
        # position-free caption template and never learned positions.  The
        # reference tolerates this on COCO (annotator noise); here position
        # is a primary signal, so flips are off for this task.  The encoder
        # trains FROM SCRATCH (no torchvision weights in this env) against
        # a 1,024-way attribute-binding vocabulary — 1e-4 is a FINE-TUNE
        # rate (reference readme.md:110-125); from-scratch gets 4e-4.
        cfg = cfg.replace(aug_hflip=0.0, encoder_lr=4e-4)

    rows = []
    best_bleu4 = a.best_floor
    if a.resume:
        cfg = cfg.replace(resume=a.resume)
    trainer = Trainer(cfg, log_root=os.path.join(a.out, "logs"))
    start_epoch = trainer.current_epoch if a.resume else 0
    if a.resume:
        # Epoch-indexed schedules (teacher-forcing epsilon decays toward
        # decoder_tf_min AT cfg.epochs) must span the FULL horizon, or the
        # continuation decays PAST the floor: the v3b run left epochs=32
        # while training epochs 24..55, driving inv_sigmoid epsilon from
        # 0.89 down to 0.15 — scheduled sampling the config never asked for
        # (loss rose 2.50 -> 2.70; EXPERIMENTS.md "soak v3").  epsilon is a
        # runtime scalar input, so updating cfg never recompiles.
        trainer.cfg = trainer.cfg.replace(epochs=start_epoch + a.epochs)
    spe = len(trainer.train_loader)
    print(f"steps/epoch={spe} val_batches={len(trainer.val_loader)} "
          f"start_epoch={start_epoch}", file=sys.stderr)
    for epoch in range(start_epoch, start_epoch + a.epochs):
        trainer.current_epoch = epoch
        te0 = time.time()
        means = trainer.train_epoch()
        t_train = time.time() - te0
        tv0 = time.time()
        if (epoch + 1) % a.val_every == 0 \
                or epoch + 1 == start_epoch + a.epochs:
            val = trainer.validate()
        else:
            val = {}
        t_val = time.time() - tv0
        # actual images trained, not a.n: a pre-existing dataset JSON (the
        # exists-check above) may have been generated with a different --n
        rate = len(trainer.train_loader) * trainer.cfg.batch / t_train
        rows.append((epoch, t_train, t_val, rate,
                     means.get("loss", float("nan")),
                     val.get("bleu4", float("nan"))))
        vt = getattr(trainer, "last_val_timings", None)
        vt_s = ("" if not val or not vt else
                " [" + " ".join(f"{k}={v:.1f}" for k, v in vt.items()
                                if v >= 0.05) + "]")
        print(f"epoch {epoch}: train {t_train:.1f}s ({rate:.0f} imgs/s) "
              f"val {t_val:.1f}s{vt_s} loss={means.get('loss', 0):.3f} "
              f"bleu4={val.get('bleu4', 0):.4f}", file=sys.stderr)
        # >= : on a flat curve the LATEST weights are saved, not epoch 0's
        if a.save_best and "bleu4" in val and val["bleu4"] >= best_bleu4:
            best_bleu4 = val.get("bleu4", 0.0)
            from sat_tpu.train.checkpoints import save_checkpoint
            save_checkpoint(a.save_best, trainer.cfg,
                            trainer._checkpoint_tree())
            print(f"  saved best checkpoint (bleu4={best_bleu4:.4f}) "
                  f"-> {a.save_best}", file=sys.stderr)
        if epoch + 1 == a.resume_at and epoch + 1 < start_epoch + a.epochs:
            # mid-soak operational resume: full checkpoint -> fresh Trainer
            from sat_tpu.train.checkpoints import save_checkpoint
            ck = os.path.join(a.out, "mid_soak.ckpt")
            cs0 = time.time()
            save_checkpoint(ck, trainer.cfg, trainer._checkpoint_tree())
            print(f"  checkpoint ({os.path.getsize(ck)/1e6:.0f} MB) "
                  f"in {time.time()-cs0:.1f}s; rebuilding Trainer",
                  file=sys.stderr)
            rs0 = time.time()
            # rebuild from trainer.cfg, not cfg: under --resume the live cfg
            # carries the re-spanned schedule horizon (epochs=start+N) — the
            # original cfg would reintroduce the v3b TF-epsilon-past-floor bug
            trainer = Trainer(trainer.cfg.replace(resume=ck),
                              log_root=os.path.join(a.out, "logs"))
            print(f"  resume ready in {time.time()-rs0:.1f}s "
                  f"(step={trainer.global_step})", file=sys.stderr)

    print("\n| epoch | train s | val s | imgs/s | loss | bleu4 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]:.1f} | {r[2]:.1f} | {r[3]:.0f} "
              f"| {r[4]:.3f} | {r[5]:.4f} |")
    steady = np.median([r[3] for r in rows[2:]]) if len(rows) > 2 else rows[-1][3]
    print(f"\nsteady-state: {steady:.0f} imgs/s "
          f"(first epoch {rows[0][3]:.0f} — compile+cache warmup)")


if __name__ == "__main__":
    main()
