"""Profile the flagship greedy-decode pipeline (headline bench path).

Usage: python tools/profile_decode.py [batch=512]
(run from the repo root; trace lands in /tmp/prof_dec_b{B} -> parse with
tools/parse_xplane.py)"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import numpy as np
import jax, jax.numpy as jnp
from bench import build_model
from sat_tpu.decode.beam import greedy_decode

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
OUT = f"/tmp/prof_dec_b{B}"
model, variables = build_model("shufflenet_v2_x0_5", 224, 4096, 16, encoder_dim=128)
rng = np.random.default_rng(0)
im = jnp.asarray(rng.random((B, 224, 224, 3), np.float32), jnp.bfloat16)

@jax.jit
def caption(variables, im):
    annots = model.encode(variables, im, train=False)
    return greedy_decode(variables["params"]["decoder"], model.cfg, annots,
                         max_gen_length=16).tokens

toks = caption(variables, im); np.array(toks)
with jax.profiler.trace(OUT):
    for i in range(3):
        toks = caption(variables, im + jnp.asarray(i*1e-3, jnp.bfloat16))
    np.array(toks)
print("done", glob.glob(OUT + "/**/*.xplane.pb", recursive=True))
