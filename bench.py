"""SAT-TPU headline benchmark: greedy captioning images/sec/chip.

Measures the full captioning pipeline (encoder forward + on-device greedy
attention-LSTM decode, BASELINE.json north-star metric) on the attached TPU
chip, sweeping batch size, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "imgs/s", "vs_baseline": N}

vs_baseline is measured against the >=5,000 imgs/sec/chip north-star target
(BASELINE.md; the reference's best encoder-only number is 6,834 imgs/s for
shufflenet_v2_x0_5 @ batch 128 with AMP on a consumer GPU, and its decoder is
a serial per-image beam loop that this framework replaces entirely)."""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_model(arch: str, input_size: int, vocab_size: int, precision: int,
                encoder_dim=None):
    import jax
    import jax.numpy as jnp
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel

    stoi = {f"w{i}": i for i in range(1, vocab_size - 3)}
    stoi.update({"<UNK>": vocab_size - 3, "<START>": vocab_size - 2,
                 "<END>": vocab_size - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch=arch, input_size=input_size,
                    vocab_size=vocab_size, vocab_stoi=stoi, embed_dim=256,
                    attention_dim=128, decoder_dim=512, deep_output=True,
                    precision=precision, encoder_dim=encoder_dim)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    if precision == 16:
        # bf16 inference: params + activations (no loss scaling needed on TPU)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        variables = {"params": cast(variables["params"]),
                     "state": variables["state"]}
    return model, variables


def bench_batch(model, variables, batch: int, max_gen_length: int,
                precision: int, k_small: int = 2, k_large: int = 10,
                reps: int = 3, fused=False):
    """Honest device timing through the axon tunnel.

    Client-side completion signals (block_until_ready) through the relay fire
    early, so wall-clocking single dispatches reports impossible TFLOP/s.
    Method: run K data-CHAINED caption batches inside ONE XLA program (each
    batch's input is perturbed by the previous batch's decoded tokens, so
    nothing can be parallelized or memoized), fetch the result to host (data
    arrival is the only trustworthy completion event), and take the MARGINAL
    time between k_large and k_small chains — constant RPC/fetch overhead
    cancels out."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from sat_tpu.decode.beam import greedy_decode

    dt_in = jnp.bfloat16 if precision == 16 else jnp.float32
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.random((batch, model.cfg.input_size,
                                  model.cfg.input_size, 3), np.float32),
                      dtype=dt_in)

    @partial(jax.jit, static_argnums=2)
    def loop(variables, im, k):
        def body(i, carry):
            im, acc = carry
            annots = model.encode(variables, im, train=False)
            toks = greedy_decode(variables["params"]["decoder"], model.cfg,
                                 annots, max_gen_length=max_gen_length,
                                 fused=fused).tokens
            acc = acc + toks.sum()
            im = im + (acc % 3).astype(im.dtype) * jnp.asarray(1e-4, im.dtype)
            return (im, acc)
        _, acc = jax.lax.fori_loop(0, k, body, (im, jnp.int32(0)))
        return acc

    times = {}
    for k in (k_small, k_large):
        np.array(loop(variables, im0, k))  # compile + warm
        rs = []
        for r in range(reps):
            t0 = time.time()
            np.array(loop(variables, im0 + jnp.asarray(r * 1e-3, dt_in), k))
            rs.append(time.time() - t0)
        times[k] = float(np.median(rs))
    per_batch = (times[k_large] - times[k_small]) / (k_large - k_small)
    if per_batch <= 0:
        # relay noise swamped a narrow k spread: fall back to the conservative
        # whole-program bound (includes RPC overhead -> underestimates)
        per_batch = times[k_large] / k_large
    return batch / per_batch


def main(argv=None):
    p = argparse.ArgumentParser()
    # flagship: BASELINE.json config 1's encoder; also the fastest measured
    # (94k imgs/s vs shufflenet_v2_x0_5's 70k on v5e)
    p.add_argument("--arch", default="mobilenet_v3_small")
    p.add_argument("--encoder_dim", default=None, type=int,
                   help="1x1 projection dim (the reference's -14%% step-time "
                        "trick, readme.md:197)")
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--vocab_size", default=4096, type=int)
    p.add_argument("--max_gen_length", default=16, type=int)
    p.add_argument("--precision", default=16, type=int, choices=[16, 32])
    p.add_argument("--batches", nargs="+", type=int, default=None)
    p.add_argument("--quick", action="store_true",
                   help="single small batch, fewer reps (CI smoke)")
    p.add_argument("--fused", default="off", choices=["off", "step", "loop"],
                   help="Pallas decode kernels: 'step' = fused decoder-step, "
                        "'loop' = whole-decode-loop kernel. Measured on v5e "
                        "they tie (step) or trail (loop) the XLA scan path, "
                        "which fuses this workload extremely well — default "
                        "off (also avoids ~2min of Mosaic compiles)")
    args = p.parse_args(argv)

    # two sizes by default: each (batch, k) shape pays a pallas compile
    batches = args.batches or ([64] if args.quick else [256, 512])
    k_large = 12 if args.quick else 10

    model, variables = build_model(args.arch, args.input_size,
                                   args.vocab_size, args.precision,
                                   args.encoder_dim)

    # secondary metric: p50 single-image caption latency (the reference's
    # serial per-image loop prints "Inference in ... ms" — visualize.ipynb)
    if not args.quick:
        try:
            # B=1 is far below the relay's measurement floor; a 400-caption
            # in-program chain makes the marginal time resolvable
            lat = bench_batch(model, variables, 1, args.max_gen_length,
                              args.precision, k_small=2, k_large=402, reps=3)
            print(f"# p50 single-image caption latency: {1e3/lat:.3f} ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"# latency probe failed: {type(e).__name__}", file=sys.stderr)

    best, best_b = 0.0, 0
    for b in batches:
        try:
            v = bench_batch(model, variables, b, args.max_gen_length,
                            args.precision, k_small=2, k_large=k_large,
                            reps=1 if args.quick else 3,
                            fused={"off": False, "step": True,
                                   "loop": "loop"}[args.fused])
        except Exception as e:  # OOM at large batch: report what fits
            print(f"# batch {b} failed: {type(e).__name__}", file=sys.stderr)
            continue
        print(f"# {args.arch} b={b}: {v:.0f} imgs/s", file=sys.stderr)
        if v > best:
            best, best_b = v, b
    result = {
        "metric": "greedy_captioning_images_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "imgs/s",
        "vs_baseline": round(best / 5000.0, 3),
        "config": {"arch": args.arch, "batch": best_b,
                   "input_size": args.input_size,
                   "max_gen_length": args.max_gen_length,
                   "precision": args.precision, "vocab": args.vocab_size,
                   "fused_kernel": args.fused},
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
