"""Batch captioning CLI — the production serving path.

The reference's only inference surfaces are notebooks looping one image at a
time through ``SAT.caption()`` (reference: visualize.ipynb cell 1;
model.py:252-260 decodes per image even for batches).  This CLI captions
directories of images at full device throughput: native C++ decode pool on
the host, one jitted encode+beam program reused across fixed-shape batches,
JSONL out.

    python -m sat_tpu.serve --checkpoint last.ckpt --images photos/ \
        --batch 256 --beamk 3 --rescore_method LN --output captions.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from functools import partial
from typing import List, Optional

import numpy as np

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def gather_images(specs: List[str]) -> List[str]:
    """Expand dirs / globs / files into a sorted unique image-path list."""
    paths: List[str] = []
    for spec in specs:
        if os.path.isdir(spec):
            for root, _, files in os.walk(spec):
                paths.extend(os.path.join(root, f) for f in files
                             if f.lower().endswith(_IMG_EXTS))
        elif any(ch in spec for ch in "*?[") and not os.path.exists(spec):
            hits = [p for p in glob.glob(spec, recursive=True)
                    if p.lower().endswith(_IMG_EXTS)]
            if not hits:
                print(f"warning: --images glob {spec!r} matched nothing",
                      file=sys.stderr)
            paths.extend(hits)
        else:
            # literal path first: a file genuinely named 'img[1].jpg' must
            # not be swallowed by glob expansion (it would match 'img1.jpg')
            paths.append(spec)
    return sorted(dict.fromkeys(paths))


def decode_images(paths: List[str], size: int, pool):
    """(N, size, size, 3) uint8 center crops + per-image ok mask; native pool
    with PIL fallback. A corrupt/undecodable file must NOT kill the serving
    run — it is flagged ok=False and the caller emits an error record."""
    from .data.dataset import decode_resized, square_crop
    n = len(paths)
    if pool is not None:
        offs = np.full((n, 2), -1.0, np.float32)  # center-crop sentinel
        imgs, ok = pool.decode_batch(paths, size, offs)
    else:
        imgs = np.zeros((n, size, size, 3), np.uint8)
        ok = np.zeros(n, bool)
    for j in np.flatnonzero(~ok):
        try:
            imgs[j] = square_crop(decode_resized(paths[j], size), size)
            ok[j] = True
        except Exception:
            pass  # stays ok=False
    return imgs, ok


def main(argv=None):
    from .utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="batch image captioning")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--images", nargs="+", required=True,
                   help="image files, directories, or globs")
    p.add_argument("--batch", default=64, type=int)
    p.add_argument("--beamk", default=3, type=int)
    p.add_argument("--max_gen_length", default=32, type=int)
    p.add_argument("--temperature", nargs="+", default=[1.0], type=float)
    p.add_argument("--sample_method", default="beam",
                   choices=["beam", "multinomial", "topk"])
    p.add_argument("--sample_topk", default=3, type=int)
    p.add_argument("--decoder_noise", default=None, type=float)
    p.add_argument("--rescore_method", default="LN")
    p.add_argument("--rescore_reward", default=0.5, type=float)
    p.add_argument("--early_exit", action="store_true", default=True,
                   help="stop decoding as soon as every caption in the batch "
                        "has ended (exact — pinned vs the fixed-length scan; "
                        "wins when captions are much shorter than "
                        "--max_gen_length, which real checkpoints' are). "
                        "Default on; --no_early_exit reverts")
    p.add_argument("--no_early_exit", dest="early_exit", action="store_false")
    p.add_argument("--return_all", action="store_true",
                   help="emit all beamk candidates per image")
    p.add_argument("--mesh_shape", nargs="+", default=[-1], type=int)
    p.add_argument("--mesh_axes", nargs="+", default=["data"], type=str,
                   help="'data model' shards the vocab projection/embedding "
                        "over the second axis (vocab-dim tensor parallelism)")
    p.add_argument("--precision", default=16, type=int, choices=[16, 32])
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--output", default="-", help="JSONL path ('-' = stdout)")
    a = p.parse_args(argv)

    paths = gather_images(a.images)
    if not paths:
        print("no images found", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp

    from . import native
    from .decode.api import unpack_beam_result
    from .decode.beam import beam_search
    from .parallel.mesh import create_mesh, place_tree, shard_batch
    from .train.checkpoints import load_any_checkpoint

    # Serving is embarrassingly parallel: scale across HOSTS by running one
    # independent sat_tpu.serve per host over its own image shard (no
    # jax.distributed — there is nothing to synchronize and a lock-step
    # global batch would only couple the hosts' tail latencies). The mesh
    # below spans this host's chips.
    model, variables = load_any_checkpoint(a.checkpoint)
    vocab = model.vocab
    size = model.cfg.input_size
    dt = jnp.bfloat16 if a.precision == 16 else jnp.float32
    if a.precision == 16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    rescore = None if a.rescore_method in ("None", "none", "") else a.rescore_method
    temperature = (a.temperature[0] if len(a.temperature) == 1
                   else list(a.temperature))

    @jax.jit
    def step(variables, images_u8, rng):
        images = images_u8.astype(dt) / jnp.asarray(255.0, dt)
        annots = model.encode(variables, images, train=False)
        return beam_search(
            variables["params"]["decoder"], model.cfg, annots, beamk=a.beamk,
            max_gen_length=a.max_gen_length, temperature=temperature,
            sample_method=a.sample_method, sample_topk=a.sample_topk,
            decoder_noise=a.decoder_noise, rescore_method=rescore,
            rescore_reward=a.rescore_reward, rng=rng,
            early_exit=a.early_exit)

    # Data-parallel serving: shard the batch over every attached device
    # (ICI collectives via jax.sharding; the reference can only serve on one
    # GPU, SURVEY.md §2.6). Single-device this is a no-op.  With
    # --mesh_axes data model the vocab projection/embedding additionally
    # shard over the model axis (place_tree's vocab-dim TP rules).
    mesh = create_mesh(tuple(a.mesh_shape), tuple(a.mesh_axes))
    n_dev = int(mesh.devices.size)
    if a.batch % n_dev:
        a.batch += n_dev - a.batch % n_dev
        print(f"# batch rounded up to {a.batch} ({n_dev} devices)",
              file=sys.stderr)
    variables = place_tree(variables, mesh)

    pool = native.shared_pool()
    out = sys.stdout if a.output == "-" else open(a.output, "w")
    rng = jax.random.PRNGKey(a.seed)
    n_done, t0 = 0, time.time()

    def emit(chunk, ok, res):
        nonlocal n_done
        caps, scores, _, ppl = unpack_beam_result(
            jax.device_get(res), model.grid_hw, return_all=a.return_all)
        for i, path in enumerate(chunk):
            if not ok[i]:
                rec = {"image": path, "error": "undecodable image"}
            elif a.return_all:
                rec = {"image": path, "candidates": [
                    {"caption": " ".join(vocab.itos(t) for t in c),
                     "score": s, "perplexity": pp}
                    for c, s, pp in zip(caps[i], scores[i], ppl[i])]}
            else:
                rec = {"image": path,
                       "caption": " ".join(vocab.itos(t) for t in caps[i]),
                       "score": scores[i], "perplexity": ppl[i]}
            out.write(json.dumps(rec) + "\n")
        n_done += len(chunk)
        print(f"\r# {n_done}/{len(paths)} "
              f"({n_done / (time.time() - t0):.0f} imgs/s incl. compile)",
              end="", file=sys.stderr)

    # one-batch pipelining: dispatch batch N, then while the device runs it,
    # decode batch N+1 on the host; fetch N's results only when N+1 is in
    # flight (jax dispatch is async — device_get is the only sync point)
    pending = None
    try:
        for lo in range(0, len(paths), a.batch):
            chunk = paths[lo:lo + a.batch]
            imgs, ok = decode_images(chunk, size, pool)
            n = len(chunk)
            if n < a.batch:  # pad the tail to the compiled shape
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], a.batch - n, axis=0)])
            rng, step_rng = jax.random.split(rng)
            res = step(variables, shard_batch(imgs, mesh), step_rng)
            if pending is not None:
                emit(*pending)
            pending = (chunk, ok, res)
        if pending is not None:
            emit(*pending)
        print(file=sys.stderr)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
