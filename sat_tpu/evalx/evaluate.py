"""Plain checkpoint evaluation CLI: BLEU-1..4 / GLEU / cosine / perplexity on
a dataset split (the reference's evaluate.ipynb cell-1 "load checkpoint, score
the test split" flow, minus the param search — that lives in evalx/search.py).

Accepts BOTH checkpoint formats: a SAT-TPU ``.ckpt`` or a reference
PyTorch-Lightning ``.ckpt`` (auto-detected; the Lightning file is imported
through models/lightning_import.py). This is the BLEU-parity harness: point
it at a trained reference checkpoint + the reference's dataset JSON and the
score is directly comparable to the reference's logged val metrics.

    python -m sat_tpu.evalx.evaluate --checkpoint v72.ckpt --json 128k256.json \
        --split test --beamk 5 --rescore_method LN
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional


def evaluate(model, variables, ds, batch_size: int = 64, beamk: int = 5,
             max_gen_length: int = 32, temperature: float = 1.0,
             rescore_method: Optional[str] = "LN", rescore_reward: float = 0.5,
             limit_batches: Optional[int] = None, verbose: bool = True,
             early_exit: bool = True, return_captions: bool = False):
    import jax
    import jax.numpy as jnp

    from ..data.dataset import CaptionLoader
    from ..decode.api import unpack_beam_result
    from ..decode.beam import beam_search
    from ..evalx.metrics import score_captions
    from ..parallel.mesh import create_mesh, replicate_tree, shard_batch

    loader = CaptionLoader(ds, min(batch_size, len(ds)), model.cfg.input_size,
                           shuffle=False, train=False, drop_last=False)

    # Shard scoring across every attached chip (like serve.py); on one
    # device this is a no-op.
    mesh = create_mesh((-1,), ("data",))
    n_dev = int(mesh.devices.size)
    variables = replicate_tree(variables, mesh)

    @jax.jit
    def decode(variables, images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        annots = model.encode(variables, images, train=False)
        return beam_search(variables["params"]["decoder"], model.cfg, annots,
                           beamk=beamk, max_gen_length=max_gen_length,
                           temperature=temperature,
                           rescore_method=rescore_method,
                           rescore_reward=rescore_reward,
                           early_exit=early_exit)

    import numpy as np

    embedding = jax.device_get(variables["params"]["decoder"]["embedding"])
    # Accumulate the WHOLE split, then score once: corpus BLEU/GLEU are
    # nonlinear, so per-batch scores averaged together depend on the batch
    # size and are NOT the corpus metric (nltk corpus_bleu over the split is
    # what the reference logs and what parity requires).
    all_caps, all_enc, all_lens, all_ppl = [], [], [], []
    n_images = 0
    t0 = time.time()
    bs = -(-loader.batch_size // n_dev) * n_dev  # compiled shape, mesh-divisible
    t_max = loader.ds.encoded_captions.shape[2]
    for i, batch in enumerate(loader):
        if limit_batches is not None and i >= limit_batches:
            break
        n = batch["images"].shape[0]
        imgs = batch["images"]
        if n < bs:  # pad the tail to the compiled shape
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], bs - n, 0)])
        res = decode(variables, shard_batch({"images": imgs}, mesh)["images"])
        caps, _, _, ppl = unpack_beam_result(jax.device_get(res),
                                             model.grid_hw, return_all=False)
        all_caps.extend(caps[:n])
        all_ppl.extend(ppl[:n])
        enc = np.asarray(batch["captions"])
        if enc.shape[2] < t_max:  # bucket-trimmed batches re-pad to stack
            enc = np.pad(enc, ((0, 0), (0, 0), (0, t_max - enc.shape[2])))
        all_enc.append(enc)
        all_lens.append(np.asarray(batch["lengths"]))
        n_images += n
        if verbose:
            print(f"\r# batch {i + 1}/{len(loader)} ({n_images} images)",
                  end="", file=sys.stderr)
    if verbose:
        print(f" in {time.time() - t0:.1f}s", file=sys.stderr)
    if not all_caps:
        return ({}, []) if return_captions else {}
    metrics = score_captions(all_caps, np.concatenate(all_enc),
                             np.concatenate(all_lens), embedding=embedding,
                             perplexities=all_ppl)
    if return_captions:
        # best-beam token-id lists, split-ordered — analysis tools
        # (tools/binding_report.py) parse these back into words
        return metrics, all_caps
    return metrics


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    import argparse

    from ..data.dataset import CaptionDataset

    p = argparse.ArgumentParser(description="evaluate a checkpoint on a split")
    p.add_argument("--checkpoint", required=True,
                   help="SAT-TPU or reference-Lightning .ckpt")
    p.add_argument("--json", default=None, help="dataset json (default: from ckpt)")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--batch", default=64, type=int)
    p.add_argument("--beamk", default=5, type=int)
    p.add_argument("--max_gen_length", default=32, type=int)
    p.add_argument("--temperature", default=1.0, type=float)
    p.add_argument("--rescore_method", default="LN")
    p.add_argument("--rescore_reward", default=0.5, type=float)
    p.add_argument("--limit_batches", default=None, type=int)
    p.add_argument("--early_exit", action="store_true", default=True,
                   help="stop each batch's decode when all captions end "
                        "(exact — pinned vs the fixed-length scan; faster on "
                        "trained models). Default on; --no_early_exit reverts")
    p.add_argument("--no_early_exit", dest="early_exit", action="store_false")
    a = p.parse_args(argv)

    from ..train.checkpoints import load_any_checkpoint
    model, variables = load_any_checkpoint(a.checkpoint)
    ds = CaptionDataset(a.json or model.cfg.json, a.split)
    rescore = None if a.rescore_method in ("None", "none", "") else a.rescore_method
    metrics = evaluate(model, variables, ds, batch_size=a.batch,
                       beamk=a.beamk, max_gen_length=a.max_gen_length,
                       temperature=a.temperature, rescore_method=rescore,
                       rescore_reward=a.rescore_reward,
                       limit_batches=a.limit_batches,
                       early_exit=a.early_exit)
    print(json.dumps({"split": a.split, "beamk": a.beamk, **
                      {k: round(v, 5) for k, v in metrics.items()}}))
    return metrics


if __name__ == "__main__":
    main()
