"""Profile the flagship decode pipelines (headline bench paths).

Usage: python tools/profile_decode.py [batch=512] [--beam K] [--packed 0|1]
(run from the repo root; trace lands in /tmp/prof_dec_b{B}[_beam{K}] ->
parse with tools/parse_xplane.py)

--beam K profiles the batched beam search (the validation inner loop of
every training run: val_beamk=3, reference model.py:684-697) instead of
greedy.  --packed forces the space-to-depth packed stem on/off (default:
the model's auto policy)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import glob
import numpy as np
import jax, jax.numpy as jnp
from bench import build_model
from sat_tpu.decode.beam import beam_search, greedy_decode

ap = argparse.ArgumentParser()
ap.add_argument("batch", nargs="?", type=int, default=512)
ap.add_argument("--beam", type=int, default=0,
                help="profile beam search at this k (0 = greedy)")
ap.add_argument("--packed", type=int, default=None, choices=(0, 1),
                help="force the packed stem off/on (default: auto policy)")
ap.add_argument("--folded", type=int, default=None, choices=(0, 1),
                help="force the folded shufflenet encoder off/on "
                     "(default: auto policy)")
ap.add_argument("--steps", type=int, default=16)
args = ap.parse_args()

B, K = args.batch, args.beam
OUT = (f"/tmp/prof_dec_b{B}" + (f"_beam{K}" if K else "")
       + ("" if args.packed is None else f"_packed{args.packed}")
       + ("" if args.folded is None else f"_folded{args.folded}"))
model, variables = build_model("shufflenet_v2_x0_5", 224, 4096, 16,
                               encoder_dim=128)
if args.packed is not None:
    model.cfg.packed_stem = bool(args.packed)
if args.folded is not None:
    model.cfg.folded_encoder = bool(args.folded)
rng = np.random.default_rng(0)
im = jnp.asarray(rng.random((B, 224, 224, 3), np.float32), jnp.bfloat16)

@jax.jit
def caption(variables, im):
    annots = model.encode(variables, im, train=False)
    if K:
        return beam_search(variables["params"]["decoder"], model.cfg, annots,
                           beamk=K, max_gen_length=args.steps).tokens
    return greedy_decode(variables["params"]["decoder"], model.cfg, annots,
                         max_gen_length=args.steps).tokens

toks = caption(variables, im); np.array(toks)
with jax.profiler.trace(OUT):
    for i in range(3):
        toks = caption(variables, im + jnp.asarray(i*1e-3, jnp.bfloat16))
    np.array(toks)
print("done", glob.glob(OUT + "/**/*.xplane.pb", recursive=True))
