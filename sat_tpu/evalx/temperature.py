"""Temperature scaling calibration (Guo et al. 2017; reference:
temperature_scaling.py:10-61): collect teacher-forced logits/targets over the
val split (epsilon=1), then fit a scalar temperature T by SGD(momentum=0.8,
nesterov, lr=1e-2) on the cross entropy of logits/T for 70 steps."""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np


def collect_logits(model, variables, ds, batch_size: int = 16,
                   max_batches: int = 41) -> Tuple[np.ndarray, np.ndarray]:
    import jax
    import jax.numpy as jnp
    from ..data.dataset import CaptionLoader
    from ..models.sat import (flatten_caption_batch, repeat_annotations,
                              train_forward)

    loader = CaptionLoader(ds, batch_size, model.cfg.input_size, shuffle=False,
                           train=False, drop_last=True)

    @jax.jit
    def fwd(variables, images, caps, lens):
        images = images.astype(jnp.float32) / 255.0
        annots = model.encode(variables, images, train=False)
        caps_f, lens_f, r = flatten_caption_batch(caps, lens)
        annots = repeat_annotations(annots, r)
        # epsilon=1: always teacher-forced (temperature_scaling.py:37)
        logits, targets, _ = train_forward(
            variables["params"]["decoder"], model.cfg, annots, caps_f, lens_f,
            jnp.asarray(1.0), None, train=False)
        return logits, targets, lens_f

    all_logits, all_targets = [], []
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        logits, targets, lens_f = jax.device_get(fwd(
            variables, jnp.asarray(batch["images"]),
            jnp.asarray(batch["captions"]), jnp.asarray(batch["lengths"])))
        # pack: keep only valid positions (the reference uses packed data)
        for row_l, row_t, l in zip(logits, targets, lens_f):
            all_logits.append(row_l[:l])
            all_targets.append(row_t[:l])
    return np.concatenate(all_logits), np.concatenate(all_targets)


def fit_temperature(logits: np.ndarray, targets: np.ndarray,
                    steps: int = 70, lr: float = 1e-2, momentum: float = 0.8,
                    init: float = 1.5, verbose: bool = False) -> float:
    """SGD+nesterov on CE(logits/T, targets) (temperature_scaling.py:50-61)."""
    import jax
    import jax.numpy as jnp

    logits_j = jnp.asarray(logits)
    targets_j = jnp.asarray(targets)

    def ce(t):
        lp = jax.nn.log_softmax(logits_j / t, axis=-1)
        return -jnp.take_along_axis(lp, targets_j[:, None], axis=1).mean()

    grad = jax.jit(jax.grad(ce))
    t, buf = float(init), 0.0
    for i in range(steps):
        g = float(grad(jnp.asarray(t)))
        buf = momentum * buf + g
        g_nesterov = g + momentum * buf
        t = t - lr * g_nesterov
        if verbose:
            print(f"step {i}: T={t:.4f}")
    return t


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    from ..data.dataset import CaptionDataset
    from ..train.checkpoints import load_any_checkpoint

    p = argparse.ArgumentParser(description="temperature scaling calibration")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--json", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--max_batches", default=41, type=int)
    p.add_argument("--steps", default=70, type=int)
    a = p.parse_args(argv)
    model, variables = load_any_checkpoint(a.checkpoint)
    ds = CaptionDataset(a.json or model.cfg.json, a.split)
    logits, targets = collect_logits(model, variables, ds, a.batch_size,
                                     a.max_batches)
    t = fit_temperature(logits, targets, steps=a.steps, verbose=True)
    print(f"temperature = {t:.4f}")
    return t


if __name__ == "__main__":
    main()
