"""Xplane A/B of exact small-k top-k candidates at the beam-search shape.

The beam-3 per-op profile (EXPERIMENTS.md round 3) showed lax.top_k over the
(B*k, V) masked-logit rows as 2.76 ms/batch at b256 — 54% of the decode scan.
All candidates here are EXACT (same winners, same tie order: descending value,
ascending index) — approx_max_k is not eligible (no exactness guarantee at
any recall_target).

Usage: python tools/ab_topk.py [rows=768] [cols=4096] [k=3]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 768
cols = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
ITERS = 64


def topk_sort(x):
    """baseline: lax.top_k (variadic sort lowering)."""
    return jax.lax.top_k(x, k)


def topk_iterative(x):
    """THE SHIPPED implementation (sat_tpu/decode/beam.py::topk_small),
    imported so this A/B always measures exactly what beam_search runs."""
    from sat_tpu.decode.beam import topk_small
    return topk_small(x, k)


def topk_windowed(x):
    """per-128-window lax.top_k (cheaper sort networks), exact combine."""
    w = 128
    g = x.shape[-1] // w
    xw = x.reshape(x.shape[:-1] + (g, w))
    wv, wi = jax.lax.top_k(xw, k)                     # (..., g, k)
    flat_i = (jax.lax.broadcasted_iota(jnp.int32, wi.shape, wi.ndim - 2) * w
              + wi).reshape(x.shape[:-1] + (g * k,))
    flat_v = wv.reshape(x.shape[:-1] + (g * k,))
    # ties across windows must break by ORIGINAL index: window-major layout
    # is original-index-major, and within a window top_k is index-ascending
    v, j = jax.lax.top_k(flat_v, k)
    return v, jnp.take_along_axis(flat_i, j, axis=-1)


CANDS = {
    "sort_f32": (topk_sort, jnp.float32),
    "sort_bf16": (topk_sort, jnp.bfloat16),
    "iter_f32": (topk_iterative, jnp.float32),
    "iter_bf16": (topk_iterative, jnp.bfloat16),
    "win_f32": (topk_windowed, jnp.float32),
    "win_bf16": (topk_windowed, jnp.bfloat16),
}


def chained(fn, name):
    def run(x0):
        def body(i, carry):
            x, acc = carry
            v, idx = fn(x)
            acc = acc + idx.sum() + v.astype(jnp.float32).sum().astype(jnp.int32)
            # data-chain: perturb one element so iterations can't fuse/hoist
            x = x.at[0, 0].add((acc % 3).astype(x.dtype) * 1e-3)
            return (x, acc)
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x0, jnp.int32(0)))
        return acc
    run.__name__ = name  # distinct jit_<name> module per candidate in the trace
    return jax.jit(run)


rng = np.random.default_rng(0)
x_np = rng.standard_normal((rows, cols)).astype(np.float32) * 5
# tie-heavy variant: quantized values force many exact ties, so the
# ascending-index tie-break is actually exercised, not just sampled
x_ties = np.round(x_np).astype(np.float32)

OUT = f"/tmp/ab_topk_{rows}x{cols}_k{k}"
fns = {}
for name, (fn, dt) in CANDS.items():
    for data in (x_np, x_ties):
        x = jnp.asarray(data, dt)
        # exactness check vs lax.top_k on the SAME dtype (bf16 candidates
        # must match bf16 sort — the beam integration compares
        # like-for-like ranks)
        v, i = jax.jit(fn)(x)
        vs, is_ = jax.lax.top_k(x, k)
        assert np.array_equal(np.asarray(i), np.asarray(is_)), \
            f"{name}: idx mismatch"
        assert np.array_equal(np.asarray(v, np.float32),
                              np.asarray(vs, np.float32)), f"{name}: val mismatch"
    x = jnp.asarray(x_np, dt)
    fns[name] = (chained(fn, name), x)
    np.array(fns[name][0](x))  # compile before the trace

with jax.profiler.trace(OUT):
    accs = [fns[name][0](fns[name][1]) for name in fns]
    for a in accs:
        np.array(a)
print("exactness: all candidates match lax.top_k bit-for-bit (same dtype)")
print("trace:", glob.glob(OUT + "/**/*.xplane.pb", recursive=True))
print(f"parse: python tools/parse_xplane.py {OUT} 12   # /{ITERS} per call")
