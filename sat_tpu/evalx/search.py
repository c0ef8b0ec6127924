"""Decode-hyperparameter random search -> CSV (reference: evaluate.ipynb
cells 3-10): N random trials over beamk / temperature / sample method /
decoder noise / rescore method+reward, each scored on a few test batches;
results appended to a pandas CSV for scatter/correlation analysis."""

from __future__ import annotations

import argparse
import os
import random
import time
from typing import Dict, List, Optional

import numpy as np


def run_search(model, variables, ds, n_trials: int = 32, batches_per_trial: int = 4,
               batch_size: int = 16, csv_path: str = "evaluations.csv",
               max_gen_length: int = 32, seed: int = 0,
               beamk_range=(5, 20), temp_range=(0.7, 1.2),
               methods=("beam", "multinomial", "topk"),
               noises=(None, 0.05, 0.1, 0.2),
               rescores=(None, "LN", "WR", "BAR"),
               rewards=(0.25, 0.5, 1.0, 2.0)):
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from ..data.dataset import CaptionLoader
    from ..decode.api import caption_from_annotations
    from ..evalx.metrics import score_captions

    rng = random.Random(seed)
    if os.path.dirname(csv_path):
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    loader = CaptionLoader(ds, batch_size, model.cfg.input_size, shuffle=False,
                           train=False, drop_last=True)
    # pre-encode the evaluation batches once (one CNN pass per batch)
    batches = []
    for i, batch in enumerate(loader):
        if i >= batches_per_trial:
            break
        images = jnp.asarray(batch["images"], jnp.float32) / 255.0
        annots = jax.device_get(model.encode(variables, images, train=False))
        batches.append((jnp.asarray(annots), batch))

    embedding = np.asarray(jax.device_get(
        variables["params"]["decoder"]["embedding"]))

    # load any prior results ONCE before the loop: every per-trial write
    # below re-emits old + new, so accumulated searches genuinely append
    # (reference: evaluate.ipynb cell 4 seeds `results` from data/results.csv)
    old = None
    if os.path.exists(csv_path):
        old = pd.read_csv(csv_path)

    rows: List[Dict] = []
    for trial in range(n_trials):
        params = {
            # discrete {5, 20} choice, matching the reference's
            # `beamks = [5, 20]  # random Choice` (evaluate.ipynb cell 3)
            "beamk": rng.choice(list(beamk_range)),
            "temperature": round(rng.uniform(*temp_range), 3),
            "sample_method": rng.choice(list(methods)),
            "sample_topk": rng.choice([3, 5]),
            "decoder_noise": rng.choice(list(noises)),
            "rescore_method": rng.choice(list(rescores)),
            "rescore_reward": rng.choice(list(rewards)),
        }
        t0 = time.time()
        trial_metrics: List[Dict[str, float]] = []
        for annots, batch in batches:
            caps, _, _, ppl = caption_from_annotations(
                variables["params"]["decoder"], model.cfg, annots,
                model.grid_hw, max_gen_length=max_gen_length,
                return_all=False, rng=jax.random.PRNGKey(trial), **params)
            m = score_captions(caps, batch["captions"], batch["lengths"],
                               embedding=embedding, perplexities=ppl)
            trial_metrics.append(m)
        means = {k: float(np.mean([m[k] for m in trial_metrics]))
                 for k in trial_metrics[0]}
        row = {**params, **means,
               "seconds_per_batch": (time.time() - t0) / len(batches)}
        rows.append(row)
        print(f"trial {trial}: bleu4={means['bleu4']:.4f} gleu={means['gleu']:.4f} "
              f"({row['seconds_per_batch']:.2f}s/batch) {params}")
        df = pd.DataFrame(rows)
        if old is not None:
            df = pd.concat([old, df], ignore_index=True)
        df.to_csv(csv_path, index=False)
    return pd.DataFrame(rows)


def correlation_report(csv_path: str) -> "object":
    """Pearson correlation of decode params vs metrics (evaluate.ipynb cells 8-10)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    num = df.select_dtypes("number")
    return num.corr(method="pearson")


def plot_search_results(csv_path: str, out_dir: str = ".") -> List[str]:
    """Scatter matrix of decode params vs metrics + correlation heatmap
    (reference: evaluate.ipynb cells 8-10 seaborn plots)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(csv_path)
    metrics = [c for c in ("bleu4", "gleu", "cosine_similarity", "perplexity")
               if c in df.columns]
    params = [c for c in ("beamk", "temperature", "rescore_reward",
                          "seconds_per_batch") if c in df.columns]
    paths = []

    fig, axes = plt.subplots(len(metrics), len(params),
                             figsize=(4 * len(params), 3 * len(metrics)),
                             squeeze=False)
    for i, m in enumerate(metrics):
        for j, p in enumerate(params):
            ax = axes[i][j]
            ax.scatter(df[p], df[m], s=12, alpha=0.7)
            if i == len(metrics) - 1:
                ax.set_xlabel(p)
            if j == 0:
                ax.set_ylabel(m)
    fig.tight_layout()
    sc = os.path.join(out_dir, "search_scatter.png")
    fig.savefig(sc, dpi=100)
    plt.close(fig)
    paths.append(sc)

    corr = df.select_dtypes("number").corr(method="pearson")
    fig, ax = plt.subplots(figsize=(1 + 0.6 * len(corr),) * 2)
    im = ax.imshow(corr.values, vmin=-1, vmax=1, cmap="RdBu_r")
    ax.set_xticks(range(len(corr)), corr.columns, rotation=90)
    ax.set_yticks(range(len(corr)), corr.columns)
    for i in range(len(corr)):
        for j in range(len(corr)):
            ax.text(j, i, f"{corr.values[i, j]:.2f}", ha="center",
                    va="center", fontsize=7)
    fig.colorbar(im)
    fig.tight_layout()
    hm = os.path.join(out_dir, "search_correlation.png")
    fig.savefig(hm, dpi=100)
    plt.close(fig)
    paths.append(hm)
    return paths


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    from ..data.dataset import CaptionDataset
    from ..train.checkpoints import load_any_checkpoint

    p = argparse.ArgumentParser(description="decode-param random search")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--json", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--trials", default=32, type=int)
    p.add_argument("--batches", default=4, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--csv", default="evaluations.csv")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--plot", action="store_true",
                   help="save scatter matrix + correlation heatmap pngs")
    a = p.parse_args(argv)
    model, variables = load_any_checkpoint(a.checkpoint)
    ds = CaptionDataset(a.json or model.cfg.json, a.split)
    run_search(model, variables, ds, n_trials=a.trials,
               batches_per_trial=a.batches, batch_size=a.batch_size,
               csv_path=a.csv, seed=a.seed)
    print(correlation_report(a.csv))
    if a.plot:
        import os as _os
        print("plots:", plot_search_results(a.csv, _os.path.dirname(a.csv) or "."))


if __name__ == "__main__":
    main()
