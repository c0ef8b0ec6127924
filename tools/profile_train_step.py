"""Profile the flagship train step at a given batch size on the real chip.

Usage: python tools/profile_train_step.py <batch> [microbatch]
                [--frozen] [--frozen_eval]
--frozen profiles the frozen-encoder step (no encoder grads, train-mode
BN); --frozen_eval additionally routes the frozen encoder through the
EVAL path (running-stat BN + shufflenet permutation folding) — the
cfg.frozen_encoder_eval A/B (VERDICT r3 #5).
(run from the repo root; trace lands in /tmp/prof_b{B}_mb{MB}[_frozen...]
-> parse with tools/parse_xplane.py)"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, glob, json
import numpy as np
import jax, jax.numpy as jnp

FROZEN = "--frozen" in sys.argv or "--frozen_eval" in sys.argv
FROZEN_EVAL = "--frozen_eval" in sys.argv
pos = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(pos[0])
MB = int(pos[1]) if len(pos) > 1 else 0
OUT = (f"/tmp/prof_b{B}_mb{MB}"
       + ("_frozen" if FROZEN and not FROZEN_EVAL else "")
       + ("_frozen_eval" if FROZEN_EVAL else ""))

from sat_tpu.config import SATConfig
from sat_tpu.train.loop import Trainer

rng = np.random.default_rng(0)
arch, input_size, vocab_size, precision = "shufflenet_v2_x0_5", 224, 4096, 16
n_refs, T = 5, 22
stoi = {f"w{i}": i for i in range(1, vocab_size - 3)}
stoi.update({"<UNK>": vocab_size - 3, "<START>": vocab_size - 2,
             "<END>": vocab_size - 1, "<PAD>": 0})

def split(n):
    lens = rng.integers(6, 20, (n, n_refs)).astype(int)
    caps = np.zeros((n, n_refs, T), np.int32)
    caps[..., 0] = vocab_size - 2
    for i in range(n):
        for r in range(n_refs):
            L = int(lens[i, r])
            caps[i, r, 1:L] = rng.integers(1, vocab_size - 3, L - 1)
            caps[i, r, L] = vocab_size - 1
    return {"samples": n, "img_paths": [f"mem://{i}" for i in range(n)],
            "encoded_captions": caps.tolist(), "lengths": lens.tolist()}

ds = {"vocab_stoi": stoi, "vocab_size": vocab_size, "embed_dim": None,
      "pretrained_embedding": None, "min_count": 1, "max_cap_length": 20,
      "train": split(8), "val": split(8), "test": split(8)}
# encoder_finetune_after=1 (NOT 0): the optimizer's encoder group exists
# only when > 0 (reference model.py:745-746) — with 0 the encoder grads were
# unused, XLA DCE'd the whole encoder backward, and the "finetune" and
# "frozen" profiles compiled to the IDENTICAL program (round-5 discovery:
# identical module fingerprints in both traces).
cfg = SATConfig(encoder_arch=arch, input_size=input_size, batch=B,
                embed_dim=256, attention_dim=128, decoder_dim=512,
                deep_output=True, precision=precision, encoder_dim=128,
                encoder_finetune_after=1, encoder_lr=1e-4, epochs=1,
                microbatch=MB, frozen_encoder_eval=FROZEN_EVAL)
trainer = Trainer(cfg, dataset=ds, log_root="/tmp/bench_logs")

images = jnp.asarray(rng.integers(0, 256, (B, input_size, input_size, 3),
                                  np.int64), jnp.uint8)
caps = jnp.asarray(np.resize(np.asarray(ds["train"]["encoded_captions"],
                                        np.int32), (B, n_refs, T)))
lens = jnp.asarray(np.resize(np.asarray(ds["train"]["lengths"], np.int32),
                             (B, n_refs)))
batch = {"images": images, "captions": caps, "lengths": lens}
lrs = {k: jnp.asarray(1e-4, jnp.float32)
       for k in ("decoder", "embedding", "encoder")}
eps = jnp.asarray(1.0, jnp.float32)

def step(v, o, i):
    return trainer._jit_train_step(v, o, batch, lrs, eps,
                                   jax.random.fold_in(jax.random.PRNGKey(0), i),
                                   train_encoder=not FROZEN)

v, o = trainer.variables, trainer.opt_state
v, o, m = step(v, o, 0)  # compile
np.array(m["loss"])
with jax.profiler.trace(OUT):
    for i in range(1, 4):
        v, o, m = step(v, o, i)
    np.array(m["loss"])
print("trace done:", glob.glob(OUT + "/**/*.xplane.pb", recursive=True))
