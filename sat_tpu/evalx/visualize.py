"""Attention-map visualizer (reference: visualize.ipynb cell 1 ``make_visual``).

Loads one image from a dataset split, captions it with ``return_all=True``,
prints GT references + the top-k predictions with scores/perplexity and a
single-image BLEU, then renders per-word attention masks
``((a-min)/(max-min))^5`` upscaled over the image plus a total-attention panel,
saving ``<out_dir>/<img_name>_result.jpg``."""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Union

import numpy as np
from PIL import Image

from ..data.dataset import CaptionDataset
from ..decode.api import caption_from_annotations
from ..evalx.metrics import corpus_bleu
from ..utils.images import load_square


def make_visual(model, variables, valid_ds: Optional[CaptionDataset] = None,
                idx: int = 0, image_path: Optional[str] = None,
                beamk: int = 3, max_gen_length: int = 32,
                temperature: Union[float, Sequence[float]] = 1.0,
                sample_method: str = "beam", sample_topk: int = 3,
                decoder_noise: Optional[float] = None,
                rescore_method: Optional[str] = "LN",
                rescore_reward: float = 1.0, show_topk: int = 1,
                out_dir: str = "data/visualize",
                input_size: Optional[int] = None) -> str:
    """Returns the saved figure path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    visual_size, scale, font_scale, columns, labelpad = 256, 5, 5, 4, 4
    input_size = input_size or model.cfg.input_size
    vocab = model.vocab

    if image_path is not None:
        # arbitrary image: no ground-truth references / single-image BLEU
        img_path, references = image_path, None
    else:
        assert valid_ds is not None, "need a dataset split or --image"
        img_path = valid_ds.img_paths[idx]
        references = [list(map(int, c[1:l])) for c, l in
                      zip(valid_ds.encoded_captions[idx],
                          valid_ds.lengths[idx])]
    img_name = os.path.splitext(os.path.basename(img_path))[0]

    title = f"{img_name}\n"
    if references is not None:
        gt_captions = [" ".join(vocab.itos(t) for t in r)
                       for r in references]
        for i, cap in enumerate(gt_captions):
            s = f"Caption {i} : {cap}"
            title += s + "\n"
            print(s)

    img_pil = load_square(img_path, size=visual_size)
    img_in = np.asarray(img_pil.resize((input_size, input_size)),
                        np.float32)[None] / 255.0

    t0 = time.time()
    annots = model.encode(variables, jnp.asarray(img_in), train=False)
    captions, scores, alphas, ppl = caption_from_annotations(
        variables["params"]["decoder"], model.cfg, annots, model.grid_hw,
        beamk=beamk, max_gen_length=max_gen_length, temperature=temperature,
        sample_method=sample_method, sample_topk=sample_topk,
        decoder_noise=decoder_noise, rescore_method=rescore_method,
        rescore_reward=rescore_reward, return_all=True)
    dur = time.time() - t0
    s = (f"Inference in {dur*1e3:.2f} ms for beamk={beamk} and "
         f"length={max(len(c) for c in captions[0])}")
    title += s + "\n"
    print(s)

    for i in range(min(beamk, show_topk)):
        words = vocab.decode(captions[0][i])
        s = (f"Prediction {i} (s={scores[0][i]:.2f}, p={ppl[0][i]:.2f}) : "
             f"{' '.join(words)}")
        title += s + "\n"
        print(s)

    if references is not None:
        b1 = corpus_bleu([references], captions[0][:1], (1, 0, 0, 0))
        b4 = corpus_bleu([references], captions[0][:1], (0.25,) * 4)
        s = f"bleu1 = {b1:.4f}. bleu4 = {b4:.4f}"
        title += s
        print(s)

    words = vocab.decode(captions[0][0])
    atts = np.asarray(alphas[0][0])          # (len, h, w)
    cap_len = len(captions[0][0])
    num_figs = 2 + cap_len
    if cap_len < columns:
        columns = num_figs
    rows = 1 + num_figs // columns

    fig = plt.figure(figsize=[scale * columns, scale * rows])
    fig.patch.set_facecolor("w")
    fig.suptitle(title, fontsize=scale * font_scale, x=0.03, y=1,
                 horizontalalignment="left")
    ax = fig.add_subplot(rows, columns, 1)
    ax.imshow(img_pil)
    ax.set_xlabel("<START>", fontsize=scale * font_scale, labelpad=labelpad)
    ax.set_xticks([]), ax.set_yticks([])

    i = 0
    for i in range(cap_len):
        ax = fig.add_subplot(rows, columns, i + 2)
        att = atts[i]
        att = ((att - att.min()) / max(att.max() - att.min(), 1e-8)) ** 5.0
        mask = Image.fromarray(np.uint8(att * 255)).convert("RGB") \
            .resize((visual_size, visual_size))
        im = ax.imshow(img_pil)
        ax.imshow(mask, cmap="gray", alpha=0.75, extent=im.get_extent())
        ax.set_xlabel(words[i], fontsize=scale * font_scale, labelpad=labelpad)
        ax.set_xticks([]), ax.set_yticks([])

    ax = fig.add_subplot(rows, columns, i + 3)
    att = atts.sum(0)
    att = (att - att.min()) / max(att.max() - att.min(), 1e-8)
    mask = Image.fromarray(np.uint8(att * 255)).convert("RGB") \
        .resize((visual_size, visual_size))
    ax.imshow(mask)
    ax.set_xlabel("Total Attention", fontsize=scale * font_scale,
                  labelpad=labelpad)
    ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{img_name}_result.jpg")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    import argparse
    import jax
    from ..train.checkpoints import load_any_checkpoint

    p = argparse.ArgumentParser(description="attention visualization")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--json", default=None, help="dataset json (default: from ckpt)")
    p.add_argument("--split", default="val")
    p.add_argument("--idx", default=None, type=int)
    p.add_argument("--image", default=None,
                   help="caption an arbitrary image file instead of a "
                        "dataset index (no ground-truth panel)")
    p.add_argument("--beamk", default=3, type=int)
    p.add_argument("--max_gen_length", default=32, type=int)
    p.add_argument("--temperature", nargs="+", default=[1.0], type=float)
    p.add_argument("--sample_method", default="beam")
    p.add_argument("--sample_topk", default=3, type=int)
    p.add_argument("--decoder_noise", default=None, type=float)
    p.add_argument("--rescore_method", default="LN")
    p.add_argument("--rescore_reward", default=1.0, type=float)
    p.add_argument("--show_topk", default=5, type=int)
    p.add_argument("--out_dir", default="data/visualize")
    a = p.parse_args(argv)

    model, variables = load_any_checkpoint(a.checkpoint)
    if a.image is not None:
        if a.idx is not None or a.json is not None:
            p.error("--image conflicts with --idx/--json (it captions an "
                    "arbitrary file, not a dataset sample)")
        ds, idx = None, 0
    else:
        ds = CaptionDataset(a.json or model.cfg.json, a.split)
        idx = a.idx if a.idx is not None else int(np.random.randint(len(ds)))
    path = make_visual(model, variables, ds, idx, image_path=a.image,
                       beamk=a.beamk,
                       max_gen_length=a.max_gen_length,
                       temperature=(a.temperature[0] if len(a.temperature) == 1
                                    else list(a.temperature)),
                       sample_method=a.sample_method, sample_topk=a.sample_topk,
                       decoder_noise=a.decoder_noise,
                       rescore_method=(None if a.rescore_method in ("None", "")
                                       else a.rescore_method),
                       rescore_reward=a.rescore_reward, show_topk=a.show_topk,
                       out_dir=a.out_dir)
    print("saved:", path)


if __name__ == "__main__":
    main()
