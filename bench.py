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
                precision: int, k_small: int = 2, k_large: int = 16,
                reps: int = 3, fused=False, beamk: int = 1,
                early_exit: bool = False, images=None):
    """Honest device timing through the axon tunnel.

    Client-side completion signals (block_until_ready) through the relay fire
    early, so wall-clocking single dispatches reports impossible TFLOP/s.
    Method: run K data-CHAINED caption batches inside ONE XLA program (each
    batch's input is perturbed by the previous batch's decoded tokens, so
    nothing can be parallelized or memoized), fetch the result to host (data
    arrival is the only trustworthy completion event), and take the MARGINAL
    time between k_large and k_small chains — constant RPC/fetch overhead
    cancels out.

    Returns (imgs_per_sec, spread): the rate from the MEDIAN of `reps`
    paired marginal times, and (max-min)/median of those pairs — the
    caller's variance signal (the relay is documented ±30%; VERDICT r1 #4
    asks for the spread in the JSON line)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from sat_tpu.decode.beam import beam_search, greedy_decode

    dt_in = jnp.bfloat16 if precision == 16 else jnp.float32
    if images is not None:
        # trained-checkpoint serving mode: real in-distribution pixels so the
        # decoded caption lengths (and thus early_exit's win) are real
        im0 = jnp.asarray(np.asarray(images, np.float32) / 255.0, dtype=dt_in)
        assert im0.shape[0] == batch, (im0.shape, batch)
    else:
        rng = np.random.default_rng(0)
        im0 = jnp.asarray(rng.random((batch, model.cfg.input_size,
                                      model.cfg.input_size, 3), np.float32),
                          dtype=dt_in)

    @partial(jax.jit, static_argnums=2)
    def loop(variables, im, k):
        def body(i, carry):
            im, acc = carry
            annots = model.encode(variables, im, train=False)
            if beamk > 1:
                toks = beam_search(variables["params"]["decoder"], model.cfg,
                                   annots, beamk=beamk,
                                   max_gen_length=max_gen_length,
                                   rescore_method="LN").tokens
            else:
                toks = greedy_decode(variables["params"]["decoder"], model.cfg,
                                     annots, max_gen_length=max_gen_length,
                                     fused=fused,
                                     early_exit=early_exit).tokens
            acc = acc + toks.sum()
            # data dependency on the previous batch's tokens WITHOUT a
            # full-image rewrite (profiled at ~7% of the b512 step): a
            # single-pixel in-place update is enough to defeat loop-invariant
            # hoisting, and XLA aliases the carry buffer so it's ~free
            im = im.at[0, 0, 0, :].add(
                (acc % 3).astype(im.dtype) * jnp.asarray(1e-4, im.dtype))
            return (im, acc)
        _, acc = jax.lax.fori_loop(0, k, body, (im, jnp.int32(0)))
        return acc

    raw = {}
    for k in (k_small, k_large):
        np.array(loop(variables, im0, k))  # compile + warm
        rs = []
        for r in range(reps):
            t0 = time.time()
            np.array(loop(variables, im0 + jnp.asarray(r * 1e-3, dt_in), k))
            rs.append(time.time() - t0)
        raw[k] = rs
    pairs = [(tl - ts) / (k_large - k_small)
             for tl, ts in zip(raw[k_large], raw[k_small])]
    pairs = [p for p in pairs if p > 0]
    if not pairs:
        # relay noise swamped a narrow k spread: fall back to the conservative
        # whole-program bound (includes RPC overhead -> underestimates)
        per_batch = float(np.median(raw[k_large])) / k_large
        return batch / per_batch, float("inf")
    per_batch = float(np.median(pairs))
    spread = (max(pairs) - min(pairs)) / per_batch if len(pairs) > 1 else 0.0
    return batch / per_batch, float(spread)


def bench_train_step(arch: str, input_size: int, vocab_size: int,
                     precision: int, batch: int, train_encoder: bool = True,
                     k_small: int = 2, k_large: int = 8, reps: int = 3,
                     encoder_dim=None, max_cap_length: int = 20,
                     microbatch: int = 0, frozen_eval: bool = False):
    """Training-step throughput (imgs/s/chip): augmentation -> encoder ->
    teacher-forced decoder scan -> loss -> grads -> optax update, all in one
    jitted program, K steps data-chained through the evolving params (each
    step's params feed the next, so the chain cannot parallelize). Same
    marginal-time method as bench_batch (the axon relay lies otherwise)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from sat_tpu.config import SATConfig
    from sat_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    n_refs, T = 5, max_cap_length + 2
    stoi = {f"w{i}": i for i in range(1, vocab_size - 3)}
    stoi.update({"<UNK>": vocab_size - 3, "<START>": vocab_size - 2,
                 "<END>": vocab_size - 1, "<PAD>": 0})

    def split(n):
        lens = rng.integers(6, max_cap_length, (n, n_refs)).astype(int)
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
          "pretrained_embedding": None, "min_count": 1,
          "max_cap_length": max_cap_length,
          "train": split(max(batch, 8)), "val": split(8), "test": split(8)}
    # encoder_finetune_after=1 (NOT 0): with 0 the optimizer has no encoder
    # group (reference model.py:745-746), encoder grads are dead, and XLA
    # DCE'd the encoder backward — rounds 2-4's "finetune" train metric was
    # really measuring the frozen-phase program (round-5 discovery; the
    # 22.4k record was re-based accordingly, see EXPERIMENTS.md round 5).
    cfg = SATConfig(encoder_arch=arch, input_size=input_size, batch=batch,
                    embed_dim=256, attention_dim=128, decoder_dim=512,
                    deep_output=True, precision=precision,
                    encoder_dim=encoder_dim, encoder_finetune_after=1,
                    encoder_lr=1e-4, epochs=1, microbatch=microbatch,
                    frozen_encoder_eval=frozen_eval)
    trainer = Trainer(cfg, dataset=ds, log_root="/tmp/bench_logs")

    images = jnp.asarray(rng.integers(0, 256, (batch, input_size, input_size, 3),
                                      np.int64), jnp.uint8)
    caps = jnp.asarray(np.resize(np.asarray(ds["train"]["encoded_captions"],
                                            np.int32), (batch, n_refs, T)))
    lens = jnp.asarray(np.resize(np.asarray(ds["train"]["lengths"], np.int32),
                                 (batch, n_refs)))
    dbatch = {"images": images, "captions": caps, "lengths": lens}
    lrs = {k: jnp.asarray(1e-4, jnp.float32)
           for k in ("decoder", "embedding", "encoder")}
    eps = jnp.asarray(1.0, jnp.float32)
    rng0 = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnums=(3,))
    def loop(variables, opt_state, batch, k):
        def body(i, carry):
            variables, opt_state = carry
            variables, opt_state, _ = trainer._train_step(
                variables, opt_state, batch, lrs, eps,
                jax.random.fold_in(rng0, i), train_encoder=train_encoder)
            return (variables, opt_state)
        variables, _ = jax.lax.fori_loop(0, k, body, (variables, opt_state))
        return variables["params"]["decoder"]["embedding"].sum()

    raw = {}
    for k in (k_small, k_large):
        np.array(loop(trainer.variables, trainer.opt_state, dbatch, k))
        rs = []
        for _ in range(reps):
            t0 = time.time()
            np.array(loop(trainer.variables, trainer.opt_state, dbatch, k))
            rs.append(time.time() - t0)
        raw[k] = rs
    pairs = [(tl - ts) / (k_large - k_small)
             for tl, ts in zip(raw[k_large], raw[k_small])]
    pairs = [p for p in pairs if p > 0]
    if not pairs:
        per_step = float(np.median(raw[k_large])) / k_large
        return batch / per_step, float("inf")
    per_step = float(np.median(pairs))
    spread = (max(pairs) - min(pairs)) / per_step if len(pairs) > 1 else 0.0
    return batch / per_step, float(spread)


def bench_checkpoint(args):
    """Serving measurements off a TRAINED checkpoint with a real
    caption-length distribution — the regime early-exit decoding exists for
    (the reference's decode loop stops when beams finish, model.py:427-446).
    Random-weight benches cannot show the effect: <END> rarely fires, so the
    while_loop path ties the fixed scan minus loop overhead.  Measures
    greedy and beam-LN captioning, each with and without early_exit, on
    in-distribution images (--images; e.g. the compositional-soak image dir
    that produced the checkpoint), and reports the decoded caption-length
    stats next to the rates so the early-exit win is interpretable."""
    import os
    import jax
    import jax.numpy as jnp
    from sat_tpu.decode.beam import beam_search, greedy_decode
    from sat_tpu.train.checkpoints import load_any_checkpoint

    model, variables = load_any_checkpoint(args.checkpoint)
    cfg = model.cfg
    if args.precision == 16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables)
    size = cfg.input_size
    batch = (args.batches or [256])[-1]
    # serving decode budget: the checkpoint's own validation cap unless the
    # caller overrides it — a trained model must be ALLOWED to run past its
    # typical caption length for early_exit's win to be honest
    gen = args.max_gen_length or int(getattr(cfg, "val_max_len", None) or 20)
    beamk = args.beamk if args.beamk > 1 else 3

    if args.images:
        from sat_tpu import native
        from sat_tpu.serve import decode_images, gather_images
        paths = gather_images(args.images)
        assert paths, f"--images matched nothing: {args.images}"
        need = -(-batch // len(paths))
        paths = (paths * need)[:batch]
        imgs, ok = decode_images(paths, size, native.shared_pool())
        good = np.flatnonzero(ok)
        assert good.size, "no decodable images"
        images = imgs[good[np.arange(batch) % good.size]]
    else:
        print("# WARNING: no --images given; random pixels make caption "
              "lengths (and the early-exit numbers) unrepresentative",
              file=sys.stderr)
        images = (np.random.default_rng(0)
                  .integers(0, 256, (batch, size, size, 3)).astype(np.uint8))

    # decoded caption-length stats (one fetch per mode, off-clock)
    dt = jnp.bfloat16 if args.precision == 16 else jnp.float32
    im_dev = jnp.asarray(images.astype(np.float32) / 255.0, dt)
    annots = model.encode(variables, im_dev, train=False)
    gl = np.asarray(greedy_decode(variables["params"]["decoder"], cfg, annots,
                                  max_gen_length=gen).lengths)
    bl = np.asarray(beam_search(variables["params"]["decoder"], cfg, annots,
                                beamk=beamk, max_gen_length=gen,
                                rescore_method="LN").lengths)
    len_stats = {"greedy_mean": round(float(gl.mean()), 2),
                 "greedy_p90": int(np.percentile(gl, 90)),
                 "beam_mean": round(float(bl.mean()), 2),
                 "beam_max": int(bl.max()), "cap": gen}
    print(f"# caption lengths: greedy mean {len_stats['greedy_mean']} "
          f"p90 {len_stats['greedy_p90']}, beam-{beamk} mean "
          f"{len_stats['beam_mean']} max {len_stats['beam_max']} "
          f"(cap {gen})", file=sys.stderr)

    k_large = 12 if args.quick else 10
    reps = 1 if args.quick else 3
    variants = {}
    for name, bk, ee in (("greedy", 1, False), ("greedy_early_exit", 1, True),
                         (f"beam{beamk}_LN", beamk, False),
                         (f"beam{beamk}_LN_early_exit", beamk, True)):
        try:
            v, spread = bench_batch(model, variables, batch, gen,
                                    args.precision, k_small=2,
                                    k_large=k_large, reps=reps, beamk=bk,
                                    early_exit=ee, images=images)
            # Record-grade gate for serving rows (VERDICT r4 #6: round 4's
            # b64 rows printed at 34-54% spread and got cited): remeasure
            # with doubled chains until the row clears the same 15% ceiling
            # records use, keeping the confidence-best run; a row that
            # never clears is emitted flagged `noisy` instead of silently.
            tries = 0
            while (spread > RECORD_SPREAD_CEILING and not args.quick
                   and tries < 3):
                tries += 1
                v2, s2 = bench_batch(model, variables, batch, gen,
                                     args.precision, k_small=2,
                                     k_large=2 * k_large, reps=reps,
                                     beamk=bk, early_exit=ee, images=images)
                if s2 < spread:  # keep the tighter measurement
                    v, spread = v2, s2
        except Exception as e:
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        variants[name] = {"imgs_per_sec": round(v, 1),
                          "spread": _finite(spread)}
        if spread > RECORD_SPREAD_CEILING:
            variants[name]["noisy"] = True
        print(f"# ckpt b={batch}: {name}: {v:.0f} imgs/s "
              f"(spread {spread:.0%})"
              + (" NOISY" if spread > RECORD_SPREAD_CEILING else ""),
              file=sys.stderr)
    assert variants, "every serving variant failed"
    best_name = max(variants,
                    key=lambda n: _headline_score(
                        variants[n]["imgs_per_sec"], variants[n]["spread"]))
    best = variants[best_name]
    print(json.dumps({
        "metric": "ckpt_serving_images_per_sec_per_chip",
        "value": best["imgs_per_sec"], "unit": "imgs/s",
        "vs_baseline": round(best["imgs_per_sec"] / 5000.0, 3),
        "spread": best["spread"],
        "config": {"checkpoint": os.path.basename(args.checkpoint),
                   "arch": cfg.encoder_arch, "batch": batch,
                   "max_gen_length": gen, "beamk": beamk,
                   "precision": args.precision, "mode": best_name,
                   "images": bool(args.images)},
        "variants": variants, "caption_len": len_stats}))


def _finite(x):
    """Spread for the JSON line: None when unmeasurable (single-pair quick
    runs fall back to the whole-program bound with spread=inf, and Infinity
    is not valid JSON)."""
    import math
    return round(x, 3) if x is not None and math.isfinite(x) else None


# Records are the driver's scoreboard; a record stored from a noisy relay
# window poisons the band guard for every later round (VERDICT r3 #1: a
# 45%-spread 171.7k spike displaced the honest 132.5k ±5% record and moved
# the low-side guard edge from ~112k to ~80k).  Calm-window spreads are
# 2-6% (CLAUDE.md); 15% is comfortably above calm weather and far below
# spike noise.
RECORD_SPREAD_CEILING = 0.15


def _headline_score(v: float, spread):
    """Confidence-weighted comparison key: the lower confidence bound
    v*(1-spread), tie-broken by raw value.  Headlines, records, and
    remeasure-keeps all rank by this instead of raw value, so a noisy spike
    can't out-rank a clean run it doesn't provably beat (VERDICT r3 #1b:
    under this rule BENCH_r03's honest headline is 121.7k @19%, not
    171.7k @45%).  Returned as a (bound, raw) tuple: when spread >= 1 the
    bound clamps to 0 for every run, and without the raw tie-break a very
    noisy relay sweep would end with the 0.0 init sentinel still "best"
    (ADVICE r4) — the raw value guarantees some measured config always wins."""
    import math
    s = spread if spread is not None and math.isfinite(spread) else 1.0
    return (v * (1.0 - min(max(s, 0.0), 1.0)), v)


def _record_key(metric: str, args) -> str:
    """Stable per-config key for the record band (batch excluded — the sweep
    picks the winning batch; the record is the config's best-known rate)."""
    key = "|".join([metric, args.arch, f"ed{args.encoder_dim}",
                    f"in{args.input_size}", f"p{args.precision}",
                    f"v{args.vocab_size}", f"gen{args.max_gen_length}",
                    f"fused={args.fused}", f"beamk{args.beamk}"])
    # frozen-encoder train variants are different programs with different
    # ceilings — they must not share a record band with the finetune step
    if getattr(args, "frozen_encoder", False):
        key += "|frozen_eval" if getattr(args, "frozen_eval", False) \
            else "|frozen"
    return key


def _records_path():
    import os
    return (os.environ.get("SAT_TPU_BENCH_RECORDS")
            or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_records.json"))


def _load_record(key: str):
    try:
        with open(_records_path()) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def _store_record(key: str, value: float, spread) -> None:
    """Persist a new per-config record (best value + its spread). Best-effort:
    a read-only checkout must never fail the bench.

    Spread-gated (VERDICT r3 #1a): a run with spread above
    RECORD_SPREAD_CEILING — or with no finite spread at all — can never
    become the record, no matter how high the value; it still prints as the
    session's headline, it just doesn't rewrite the scoreboard."""
    import math
    if (spread is None or not math.isfinite(spread)
            or spread > RECORD_SPREAD_CEILING):
        sp = (f"{spread:.0%}" if spread is not None and math.isfinite(spread)
              else "n/a")
        print(f"# not storing record ({value:.0f}): spread {sp} "
              f"exceeds the {RECORD_SPREAD_CEILING:.0%} record ceiling",
              file=sys.stderr)
        return
    try:
        try:
            with open(_records_path()) as f:
                records = json.load(f)
        except (OSError, ValueError):
            records = {}
        records[key] = {"value": round(value, 1),
                        "spread": (round(spread, 3)
                                   if spread is not None
                                   and math.isfinite(spread) else None)}
        with open(_records_path(), "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass


def _guard_record_band(key: str, best: float, best_spread, remeasure):
    """VERDICT r2 #8: the driver artifact is the scoreboard, and a calm-but-
    slow relay window records clean-looking underperformance (BENCH_r02
    89.4k vs the 100.5k record, both ~1-12% spread).  When a run lands >15%
    below the known record band's LOW edge, remeasure once with a doubled
    chain spread and keep the better run; never suppress — if the low number
    reproduces, emit it flagged `below_record_band` so the regression is
    visible instead of silently blamed on weather.

    The high side mirrors it (VERDICT r3 #1c): a run landing >15% ABOVE the
    band low with spread above RECORD_SPREAD_CEILING is a likely relay
    spike, not capability — it gets one doubled-chain remeasure and the
    confidence-weighted winner (`_headline_score`) is kept, so a clean
    remeasure displaces the spike before it can print or store.

    Returns (best, best_spread, below_band_flag)."""
    import math
    record = _load_record(key)
    if not record or best <= 0:
        return best, best_spread, False
    rec_spread = record.get("spread") or 0.0
    band_low = record["value"] * (1.0 - min(rec_spread, 0.5))
    suspect_low = best < 0.85 * band_low
    suspect_high = (best > 1.15 * band_low
                    and (best_spread is None
                         or not math.isfinite(best_spread)
                         or best_spread > RECORD_SPREAD_CEILING))
    if not (suspect_low or suspect_high):
        return best, best_spread, False
    side = "below" if suspect_low else "above (at high spread)"
    print(f"# {best:.0f} imgs/s is >15% {side} the record band low "
          f"{band_low:.0f} (record {record['value']:.0f} "
          f"±{rec_spread:.0%}); remeasuring with a doubled chain",
          file=sys.stderr)
    try:
        v2, spread2 = remeasure()
        print(f"# record-band remeasure: {v2:.0f} imgs/s "
              f"(spread {spread2 if math.isfinite(spread2) else -1:.0%})",
              file=sys.stderr)
        if _headline_score(v2, spread2) > _headline_score(best, best_spread):
            best, best_spread = v2, spread2
    except Exception as e:
        print(f"# record-band remeasure failed: {type(e).__name__}",
              file=sys.stderr)
    return best, best_spread, best < 0.85 * band_low


def _await_backend(max_wait_s: float, probe_timeout_s: float = 240.0) -> bool:
    """Probe the TPU backend in a SUBPROCESS until it answers or the budget
    runs out.  A dead axon relay makes the first in-process jax.devices()
    call hang indefinitely — probing out-of-process keeps this process
    un-wedged, rides out short relay flaps, and turns a hard hang into a
    clear bounded failure."""
    import os
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        # clamp each probe to the remaining budget (plus a compile-time
        # floor) so a small --relay_wait is honored instead of waiting the
        # full probe timeout against a hung first probe
        probe_s = max(30.0, min(probe_timeout_s, deadline - time.time()))
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 # must be real COMPUTE with a host fetch: device enumeration
                 # succeeds against a dead relay, only dispatch hangs
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "x = jnp.ones((64, 64));"
                 "print('ALIVE', float(np.asarray(x @ x).sum()) > 0)"],
                capture_output=True, timeout=probe_s, text=True,
                env=os.environ.copy())
            if "ALIVE" in out.stdout:
                if attempt > 1:
                    print(f"# backend reachable after {attempt} probes",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"# backend unreachable (probe {attempt}); retrying...",
              file=sys.stderr)
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


def main(argv=None):
    from sat_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # SAT_TPU_PLATFORM=cpu for off-chip smoke runs
    p = argparse.ArgumentParser()
    # flagship: the reference's own best-BLEU encoder (shufflenet_v2_x0_5,
    # dev/experiments.txt v124) + its 1x1 encoder_dim projection trick
    # (readme.md:197).  Same-window sweep (r2): shufflenet D=1024 native is
    # decode-bound at 50.8k imgs/s; projecting to 128 frees its fast encoder
    # -> 98-117k, beating mobilenet_v3_small's 82.9k (EXPERIMENTS.md).
    p.add_argument("--arch", default="shufflenet_v2_x0_5")
    p.add_argument("--encoder_dim", default=128, type=int,
                   help="1x1 projection dim (the reference's -14%% step-time "
                        "trick, readme.md:197); pass 0 for the backbone's "
                        "native dim")
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--vocab_size", default=4096, type=int)
    p.add_argument("--max_gen_length", default=None, type=int,
                   help="decode steps (default 16; with --checkpoint, the "
                        "checkpoint's val_max_len)")
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="serving bench off a TRAINED checkpoint (SAT-TPU or "
                        "reference-Lightning format): greedy + beam-LN, each "
                        "with/without early_exit, plus the decoded "
                        "caption-length stats that make the early-exit win "
                        "interpretable (random-weight runs can't show it)")
    p.add_argument("--images", nargs="+", default=None, metavar="SPEC",
                   help="with --checkpoint: image files/dirs/globs for "
                        "in-distribution serving inputs (e.g. the soak's "
                        "image dir)")
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
    p.add_argument("--beamk", default=1, type=int,
                   help="beam width; >1 measures full beam-search captioning "
                        "(LN rescoring) instead of greedy — the reference's "
                        "slowest phase (its beam loop is serial per image, "
                        "model.py:252-260)")
    p.add_argument("--train", action="store_true",
                   help="measure the training step (aug+encoder+TF-scan+grads"
                        "+update) instead of greedy captioning")
    p.add_argument("--frozen_eval", action="store_true",
                   help="with --train --frozen_encoder: run the frozen "
                        "encoder through the EVAL path (running-stat BN + "
                        "shufflenet permutation folding) — the "
                        "cfg.frozen_encoder_eval opt-in (VERDICT r3 #5)")
    p.add_argument("--frozen_encoder", action="store_true",
                   help="with --train: freeze the encoder (no encoder bwd)")
    p.add_argument("--microbatch", default=0, type=int,
                   help="with --train: in-step gradient chunking (scan over "
                        "batch/microbatch chunks; bounds the HBM working set "
                        "at the chunk size). 0 = off")
    p.add_argument("--relay_wait", default=900, type=float, metavar="S",
                   help="max seconds to wait for an unreachable TPU backend "
                        "before failing with a diagnostic (0 = no probe)")
    args = p.parse_args(argv)
    if args.encoder_dim is not None and args.encoder_dim <= 0:
        args.encoder_dim = None  # 0 = backbone-native annotation dim
    if args.max_gen_length is None and not args.checkpoint:
        args.max_gen_length = 16

    import os
    import jax
    forced_off_chip = (os.environ.get("SAT_TPU_PLATFORM")
                       or "cpu" in str(getattr(jax.config, "jax_platforms",
                                               "") or ""))
    if args.relay_wait > 0 and not forced_off_chip:
        if not _await_backend(args.relay_wait):
            print(json.dumps({"error": "TPU backend unreachable",
                              "waited_s": args.relay_wait}))
            sys.exit(1)

    if args.checkpoint:
        return bench_checkpoint(args)

    if args.train:
        batches = args.batches or ([32] if args.quick else [64, 128, 256])
        best, best_b, best_spread = 0.0, 0, None
        for b in batches:
            try:
                v, spread = bench_train_step(
                    args.arch, args.input_size, args.vocab_size,
                    args.precision, b,
                    train_encoder=not args.frozen_encoder,
                    reps=1 if args.quick else 3,
                    encoder_dim=args.encoder_dim,
                    microbatch=args.microbatch,
                    frozen_eval=args.frozen_eval)
            except Exception as e:
                print(f"# train batch {b} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            print(f"# train {args.arch} b={b}: {v:.0f} imgs/s "
                  f"(spread {spread:.0%})", file=sys.stderr)
            if _headline_score(v, spread) > _headline_score(best, best_spread):
                best, best_b, best_spread = v, b, spread
        # microbatch variant at the winning large batch: in-step gradient
        # chunking recovers small-batch cache residency while the optimizer
        # update and host round-trip amortize over the full batch (exact
        # same loss — tests/test_microbatch.py); tried as an A/B variant so
        # it can only raise the number
        best_mb = args.microbatch
        if not args.microbatch and best_b >= 128 and not args.quick:
            try:
                v, spread = bench_train_step(
                    args.arch, args.input_size, args.vocab_size,
                    args.precision, best_b,
                    train_encoder=not args.frozen_encoder, reps=3,
                    encoder_dim=args.encoder_dim, microbatch=64,
                    frozen_eval=args.frozen_eval)
                print(f"# train {args.arch} b={best_b} microbatch=64: "
                      f"{v:.0f} imgs/s (spread {spread:.0%})", file=sys.stderr)
                if _headline_score(v, spread) > _headline_score(best, best_spread):
                    best, best_spread, best_mb = v, spread, 64
            except Exception as e:
                print(f"# microbatch variant failed: {type(e).__name__}",
                      file=sys.stderr)
        key = _record_key("train_step_images_per_sec_per_chip", args)
        below_band = False
        if not args.quick and best_b:
            best, best_spread, below_band = _guard_record_band(
                key, best, best_spread,
                lambda: bench_train_step(
                    args.arch, args.input_size, args.vocab_size,
                    args.precision, best_b,
                    train_encoder=not args.frozen_encoder,
                    k_small=2, k_large=16, reps=3,
                    encoder_dim=args.encoder_dim, microbatch=best_mb,
                    frozen_eval=args.frozen_eval))
        record = _load_record(key)
        if (not args.quick and best_b
                and (record is None
                     or _headline_score(best, best_spread)
                     > _headline_score(record["value"], record.get("spread")))):
            _store_record(key, best, best_spread)
        # vs_baseline: the reference's implied end-to-end training rate
        # (~80 imgs/s: 32k imgs x 90 epochs ~ 2h, dev/presentation.txt:122-128)
        out = {
            "metric": "train_step_images_per_sec_per_chip",
            "value": round(best, 1), "unit": "imgs/s",
            "vs_baseline": round(best / 80.0, 3),
            "spread": _finite(best_spread),
            "config": {"arch": args.arch, "batch": best_b,
                       "encoder_dim": args.encoder_dim,
                       "input_size": args.input_size,
                       "precision": args.precision, "vocab": args.vocab_size,
                       "encoder_finetune": not args.frozen_encoder,
                       "microbatch": best_mb}}
        if below_band:
            out["below_record_band"] = True
        print(json.dumps(out))
        return

    # two sizes by default: each (batch, k) shape pays a pallas compile
    batches = args.batches or ([64] if args.quick else [256, 512])
    k_large = 12 if args.quick else 10

    model, variables = build_model(args.arch, args.input_size,
                                   args.vocab_size, args.precision,
                                   args.encoder_dim)

    # secondary metric: p50 single-image caption latency (the reference's
    # serial per-image loop prints "Inference in ... ms" — visualize.ipynb).
    # Greedy-only: it's a greedy B=1 probe either way, and its ~8 min of
    # b1-chain compiles would tax every --beamk run with a duplicate number
    if not args.quick and args.beamk <= 1:
        try:
            # B=1 is far below the relay's measurement floor; a 400-caption
            # in-program chain makes the marginal time resolvable
            lat, _ = bench_batch(model, variables, 1, args.max_gen_length,
                                 args.precision, k_small=2, k_large=402,
                                 reps=3)
            print(f"# p50 single-image caption latency: {1e3/lat:.3f} ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"# latency probe failed: {type(e).__name__}", file=sys.stderr)

    fused_arg = {"off": False, "step": True, "loop": "loop"}[args.fused]

    def measure(b, k_hi, early_exit=False):
        """One config; when the relay is noisy (spread > 25%), remeasure
        with a doubled chain length and keep the tighter run (VERDICT r1
        #4 headline-stabilization; a same-session b256 run kept a 30%-
        spread median under the old 35% threshold)."""
        v, spread = bench_batch(model, variables, b, args.max_gen_length,
                                args.precision, k_small=2, k_large=k_hi,
                                reps=1 if args.quick else 3,
                                fused=fused_arg, beamk=args.beamk,
                                early_exit=early_exit)
        if spread > 0.25 and not args.quick:
            v2, spread2 = bench_batch(model, variables, b,
                                      args.max_gen_length, args.precision,
                                      k_small=2, k_large=2 * k_hi, reps=3,
                                      fused=fused_arg, beamk=args.beamk,
                                      early_exit=early_exit)
            if spread2 < spread:
                v, spread = v2, spread2
        return v, spread

    best, best_b, best_spread, best_ee = 0.0, 0, None, False
    for b in batches:
        try:
            v, spread = measure(b, k_large)
        except Exception as e:  # OOM at large batch: report what fits
            print(f"# batch {b} failed: {type(e).__name__}", file=sys.stderr)
            continue
        print(f"# {args.arch} b={b}: {v:.0f} imgs/s (spread {spread:.0%})",
              file=sys.stderr)
        if _headline_score(v, spread) > _headline_score(best, best_spread):
            best, best_b, best_spread = v, b, spread
    # greedy early-exit variant at the winning batch: real checkpoints emit
    # <END> well before max_gen_length (reference loop break, model.py:441),
    # so the while_loop path can win; with random bench weights it usually
    # ties minus loop overhead — measured, not assumed.  XLA path only: the
    # Pallas kernels ignore early_exit, so the "variant" would be the same
    # cached program and the marginal time measures pure relay noise.
    if args.beamk <= 1 and args.fused == "off" and not args.quick and best_b:
        try:
            v, spread = measure(best_b, k_large, early_exit=True)
            print(f"# {args.arch} b={best_b} early_exit: {v:.0f} imgs/s "
                  f"(spread {spread:.0%})", file=sys.stderr)
            if _headline_score(v, spread) > _headline_score(best, best_spread):
                best, best_spread, best_ee = v, spread, True
        except Exception as e:
            print(f"# early_exit failed: {type(e).__name__}", file=sys.stderr)
    metric = ("greedy_captioning_images_per_sec_per_chip"
              if args.beamk <= 1 else
              f"beam{args.beamk}_captioning_images_per_sec_per_chip")
    key = _record_key(metric, args)
    below_band = False
    if not args.quick and best_b:
        best, best_spread, below_band = _guard_record_band(
            key, best, best_spread,
            lambda: measure(best_b, 2 * k_large, early_exit=best_ee))
    record = _load_record(key)
    if (not args.quick and best_b
            and (record is None
                 or _headline_score(best, best_spread)
                 > _headline_score(record["value"], record.get("spread")))):
        _store_record(key, best, best_spread)
    result = {
        "metric": metric,
        "value": round(best, 1),
        "unit": "imgs/s",
        "vs_baseline": round(best / 5000.0, 3),
        "spread": _finite(best_spread),
        "config": {"arch": args.arch, "batch": best_b,
                   "encoder_dim": args.encoder_dim,
                   "input_size": args.input_size,
                   "max_gen_length": args.max_gen_length,
                   "precision": args.precision, "vocab": args.vocab_size,
                   "fused_kernel": args.fused, "beamk": args.beamk,
                   "early_exit": best_ee},
    }
    if below_band:
        result["below_record_band"] = True
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
