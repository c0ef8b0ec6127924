"""Compositional caption grammar: the at-scale synthetic stand-in for COCO.

The round-2 quality evidence was a two-color naming task (8-word captions,
~13-word vocab) — it proves the loop converges but exercises none of COCO's
statistics.  This module generates multi-object scenes whose captions have
COCO-like shape: **1,000+ word vocabulary, 8-18 token captions, 5 paraphrase
references per image, compositional structure** (attribute words generalize
across objects, so the model cannot memorize captions — it must bind visual
properties to words).

Design
------
* A **noun lexicon of 1,024 pseudo-words**, each the unique name of a
  (color x shape x texture) visual combination (16 colors x 8 shapes x
  8 stripe textures).  Naming an object forces a joint read of all three
  visual attributes through a >1k-way softmax — the vocab-scale analogue
  of COCO object naming.
* Scenes hold 2 objects in distinct cells of a 3x3 grid, each **small or
  big**; captions mention each object's size, noun, and grid position, so
  correct captioning requires spatially-resolved attention (the property
  the round-2 color task never tested: its two regions were fixed).
* **5 paraphrases** per image from independent template + synonym draws
  (size/position synonym banks, two clause orders), mirroring COCO's 5
  independent annotators: BLEU against the references is high for a
  correct captioner but below 1.0, and a no-image prior (the corpus's
  most likely caption applied to every image) scores near zero — the
  unigram/prior baseline the soak report prints.

Reference analogue: the experiment-ledger methodology of
/root/reference/dev/experiments.txt (synthetic smoke sets via
dev_train_keep, preprocess.ipynb cell 8); the reference has no equivalent
generator — real COCO is unavailable in this environment, so this grammar
is the closest achievable stand-in for its learning dynamics.
"""

from __future__ import annotations

import json
import os
import random
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..vocab import Vocab

# ---------------------------------------------------------------------------
# Noun lexicon: 1,024 pronounceable pseudo-words <-> (color, shape, texture)
# ---------------------------------------------------------------------------

_COLORS: Tuple[Tuple[str, Tuple[int, int, int]], ...] = (
    ("c0", (200, 40, 40)), ("c1", (40, 170, 50)), ("c2", (50, 70, 210)),
    ("c3", (220, 210, 50)), ("c4", (150, 60, 190)), ("c5", (60, 200, 200)),
    ("c6", (230, 130, 30)), ("c7", (240, 240, 240)), ("c8", (120, 80, 40)),
    ("c9", (250, 150, 180)), ("c10", (90, 120, 90)), ("c11", (30, 30, 30)),
    ("c12", (130, 200, 90)), ("c13", (80, 160, 230)), ("c14", (180, 30, 120)),
    ("c15", (210, 180, 130)),
)
_N_SHAPES = 8      # circle, square, triangle, diamond, ring, cross, hbar, vbar
_N_TEXTURES = 8    # stripe angle {0,45,90,135} x frequency {low,high}

_SYL_A = ("ba", "co", "du", "fe", "gi", "ho", "ja", "ke", "lu", "mi", "no",
          "pa", "qui", "ro", "su", "ti", "vo", "wa", "xe", "yu", "za", "bri",
          "clo", "dra", "fle", "gru", "pla", "sta", "tro", "ve", "wi", "zo")
_SYL_B = ("bble", "ck", "dle", "ff", "gget", "lk", "mp", "nd", "pper", "rt",
          "sk", "tch", "vet", "wn", "x", "zzle", "bin", "cot", "dor", "fim",
          "gus", "hap", "jex", "kol", "lum", "mer", "nix", "pod", "rec",
          "sal", "tam", "vun")


def noun_word(idx: int) -> str:
    """Unique pronounceable pseudo-word for combo index in [0, 1024)."""
    return _SYL_A[idx // len(_SYL_B)] + _SYL_B[idx % len(_SYL_B)]


def noun_index(color: int, shape: int, texture: int) -> int:
    return (color * _N_SHAPES + shape) * _N_TEXTURES + texture


N_NOUNS = len(_COLORS) * _N_SHAPES * _N_TEXTURES  # 1024

# ---------------------------------------------------------------------------
# Grammar: sizes, positions, templates, synonyms
# ---------------------------------------------------------------------------

_SIZE_SYN = (("small", "little", "tiny"), ("big", "large", "huge"))
# 3x3 grid cell -> position phrase variants (each a word tuple)
_POS_SYN: Tuple[Tuple[Tuple[str, ...], ...], ...] = (
    (("top", "left"), ("upper", "left")),
    (("top",), ("upper", "middle")),
    (("top", "right"), ("upper", "right")),
    (("left",), ("middle", "left")),
    (("middle",), ("center",)),
    (("right",), ("middle", "right")),
    (("bottom", "left"), ("lower", "left")),
    (("bottom",), ("lower", "middle")),
    (("bottom", "right"), ("lower", "right")),
)


def _phrase(rng: random.Random, size: int, noun: str, cell: int) -> Dict:
    return {"size": rng.choice(_SIZE_SYN[size]), "noun": noun,
            "pos": rng.choice(_POS_SYN[cell]), "cell": cell}


def _relation(a_cell: int, b_cell: int) -> Tuple[str, ...]:
    """Spatial relation of a w.r.t. b on the 3x3 grid (primary axis wins)."""
    dy = a_cell // 3 - b_cell // 3
    dx = a_cell % 3 - b_cell % 3
    if abs(dy) >= abs(dx):
        return ("above",) if dy < 0 else ("below",)
    return ("left", "of") if dx < 0 else ("right", "of")


def _render_caption(rng: random.Random, objs: List[Dict]) -> List[str]:
    """One paraphrase: template + synonym + order draws are independent."""
    a, b = objs
    if rng.random() < 0.5:
        a, b = b, a
    t = rng.randrange(5)
    if t == 4:      # short relational form (no grid-position words)
        return (["a", a["size"], a["noun"], *_relation(a["cell"], b["cell"]),
                 "a", b["size"], b["noun"]])
    if t == 0:
        return (["a", a["size"], a["noun"], "in", "the", *a["pos"], "and",
                 "a", b["size"], b["noun"], "in", "the", *b["pos"]])
    if t == 1:
        return (["there", "is", "a", a["size"], a["noun"], "at", "the",
                 *a["pos"], "with", "a", b["size"], b["noun"], "at", "the",
                 *b["pos"]])
    if t == 2:
        return (["the", *a["pos"], "shows", "a", a["size"], a["noun"],
                 "while", "the", *b["pos"], "shows", "a", b["size"],
                 b["noun"]])
    return (["a", a["size"], a["noun"], "sits", "near", "the", *a["pos"],
             "and", "a", b["size"], b["noun"], "sits", "near", "the",
             *b["pos"]])


def grammar_words() -> List[str]:
    """Every word type the grammar can emit (nouns + attributes + glue)."""
    words = [noun_word(i) for i in range(N_NOUNS)]
    for group in _SIZE_SYN:
        words.extend(group)
    for cell in _POS_SYN:
        for variant in cell:
            words.extend(variant)
    words.extend("a in the and there is at with shows while sits near "
                 "above below of".split())
    seen, out = set(), []
    for w in words:
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


# ---------------------------------------------------------------------------
# Rendering (numpy; PIL only for the file write)
# ---------------------------------------------------------------------------


def _shape_mask(shape: int, r: int) -> np.ndarray:
    """(2r, 2r) bool mask for shape index, radius r."""
    y, x = np.mgrid[-r:r, -r:r] + 0.5
    rr = np.hypot(x, y)
    if shape == 0:                      # circle
        return rr < r
    if shape == 1:                      # square
        return np.maximum(np.abs(x), np.abs(y)) < r * 0.82
    if shape == 2:                      # triangle (up)
        return (y < r * 0.55) & (np.abs(x) < (y + r) * 0.55)
    if shape == 3:                      # diamond
        return (np.abs(x) + np.abs(y)) < r * 1.05
    if shape == 4:                      # ring
        return (rr < r) & (rr > r * 0.55)
    if shape == 5:                      # cross
        return (np.abs(x) < r * 0.3) | (np.abs(y) < r * 0.3)
    if shape == 6:                      # horizontal bar
        return np.abs(y) < r * 0.35
    return np.abs(x) < r * 0.35         # vertical bar


def _texture_field(texture: int, r: int) -> np.ndarray:
    """(2r, 2r) float in [0.55, 1.0]: stripes at angle x frequency."""
    y, x = np.mgrid[-r:r, -r:r] + 0.5
    angle = (texture % 4) * (np.pi / 4)
    freq = (1.6 if texture < 4 else 3.6) * np.pi / r
    wave = np.sin((x * np.cos(angle) + y * np.sin(angle)) * freq)
    return 0.775 + 0.225 * np.sign(wave)


def render_scene(image_size: int, objs: List[Dict],
                 nprng: np.random.Generator,
                 obj_scale: float = 1.0) -> np.ndarray:
    """objs: [{cell, color, shape, texture, size(0|1)}] -> (S,S,3) uint8.

    obj_scale multiplies the object radii (clamped to the grid cell) — the
    VERDICT r3 #4b lever for testing the "textures render too small to
    read at 224^2" hypothesis directly: scale WHAT-bearing pixels up
    without touching the grammar, grid, or caption statistics."""
    img = np.full((image_size, image_size, 3), 105, np.float32)
    cell_sz = image_size // 3
    for o in objs:
        r = int(cell_sz * (0.22 if o["size"] == 0 else 0.42) * obj_scale)
        r = max(2, min(r, cell_sz // 2 - 1))
        cy = (o["cell"] // 3) * cell_sz + cell_sz // 2
        cx = (o["cell"] % 3) * cell_sz + cell_sz // 2
        # jitter keeps the object inside its grid cell
        jit = cell_sz // 2 - r - 1
        if jit > 0:
            cy += int(nprng.integers(-jit, jit + 1))
            cx += int(nprng.integers(-jit, jit + 1))
        mask = _shape_mask(o["shape"], r)
        tex = _texture_field(o["texture"], r)
        col = np.asarray(_COLORS[o["color"]][1], np.float32)
        patch = img[cy - r:cy + r, cx - r:cx + r]
        patch[mask] = (tex[..., None] * col)[mask]
    img += nprng.normal(0, 6.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Dataset generator (reference JSON schema)
# ---------------------------------------------------------------------------


def color_diverse_nouns(n_nouns: int, n_colors: int) -> List[int]:
    """A lexicon slice of n_nouns spanning n_colors colors (VERDICT r3 #4a:
    the contiguous first-N slice is single-color — `--nouns 64` spans
    1 color x 8 shapes x 8 textures, so no soak ever exercised color).
    Balanced: n_nouns/n_colors (shape, texture) combos per color, row-major
    (shapes vary first, then textures), identical across colors so color is
    a clean independent axis."""
    assert n_nouns % n_colors == 0, (n_nouns, n_colors)
    per = n_nouns // n_colors
    assert per <= _N_SHAPES * _N_TEXTURES and n_colors <= len(_COLORS)
    combos = [(s, t) for t in range(_N_TEXTURES)
              for s in range(_N_SHAPES)][:per]
    return [noun_index(c, s, t) for c in range(n_colors)
            for (s, t) in combos]


def make_compositional_dataset(out_dir: str, n_train: int = 4096,
                               n_val: int = 512, n_test: int = 256,
                               image_size: int = 224, seed: int = 0,
                               n_nouns: int = N_NOUNS,
                               json_name: Optional[str] = None,
                               noun_ids: Optional[List[int]] = None,
                               obj_scale: float = 1.0) -> str:
    """Write images + reference-schema JSON; returns the JSON path.

    n_nouns < 1024 restricts the lexicon (tiny test sets); the full lexicon
    yields a ~1,070-word vocabulary.  noun_ids overrides the contiguous
    first-n_nouns slice with an explicit lexicon (e.g. color_diverse_nouns);
    obj_scale scales rendered object radii (render_scene)."""
    from PIL import Image

    if noun_ids is not None:
        n_nouns = len(noun_ids)
    if json_name is None:
        # rung-keyed default (same convention as tools/soak.py) so two rungs
        # sharing one out_dir never overwrite each other's JSON or images
        json_name = ("compositional" if n_nouns == N_NOUNS
                     else f"compositional_{n_nouns}")

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    # images live in a PER-DATASET directory: scene content depends on the
    # lexicon restriction and the rng stream, so sharing one imgs/ across
    # ladder rungs would silently pair a new rung's captions with a stale
    # rung's pixels (the exists-check below skips re-rendering)
    img_dir = os.path.join(out_dir, f"imgs_{json_name}")
    os.makedirs(img_dir, exist_ok=True)

    lexicon = (list(noun_ids) if noun_ids is not None
               else list(range(n_nouns)))
    words = ([noun_word(i) for i in lexicon]
             + grammar_words()[N_NOUNS:])
    vocab = Vocab.build(Counter({w: 100 for w in words}), min_count=1,
                        max_vocab=None)
    max_cap_length = 18

    def make_split(n: int, tag: str):
        img_paths, caps, lens = [], [], []
        for i in range(n):
            cells = rng.sample(range(9), 2)
            objs = []
            for cell in cells:
                ni = lexicon[rng.randrange(n_nouns)]
                color, rem = divmod(ni, _N_SHAPES * _N_TEXTURES)
                shape, texture = divmod(rem, _N_TEXTURES)
                objs.append({"cell": cell, "color": color, "shape": shape,
                             "texture": texture, "size": rng.randrange(2),
                             "noun": noun_word(ni)})
            arr = render_scene(image_size, objs, nprng, obj_scale=obj_scale)
            path = os.path.join(img_dir, f"{tag}_{i}.png")
            # ALWAYS write: scene content depends on seed and on the rng
            # stream position (n_train shifts the val/test draws), so reusing
            # a same-named file from an earlier run with different params
            # would silently pair these captions with stale pixels.  Callers
            # that want reuse gate on the dataset JSON (tools/soak.py).
            Image.fromarray(arr).save(path)
            img_paths.append(path)
            ic, il = [], []
            for _ in range(5):
                toks = _render_caption(
                    rng, [_phrase(rng, o["size"], o["noun"], o["cell"])
                          for o in objs])
                ic.append(vocab.encode(toks, max_cap_length))
                il.append(min(len(toks), max_cap_length - 1) + 1)
            caps.append(ic)
            lens.append(il)
        return {"samples": n, "img_paths": img_paths,
                "encoded_captions": caps, "lengths": lens}

    output = {"vocab_stoi": vocab.stoi_map, "vocab_size": vocab.size,
              "embed_dim": None, "pretrained_embedding": None, "min_count": 1,
              "max_cap_length": max_cap_length,
              "train": make_split(n_train, "train"),
              "val": make_split(n_val, "val"),
              "test": make_split(n_test, "test")}
    path = os.path.join(out_dir, f"{json_name}.json")
    json.dump(output, open(path, "w"))
    return path


def prior_baseline_bleu(json_path: str, split: str = "val") -> Dict[str, float]:
    """BLEU of the strongest no-image prior: caption every image with the
    corpus's modal template filled with the modal words (what a captioner
    that ignores the image converges to).  The soak report prints this as
    the floor the trained model must clearly beat."""
    from ..evalx.metrics import corpus_bleu

    data = json.load(open(json_path))
    itos = {int(v): k for k, v in data["vocab_stoi"].items()}
    refs_tok: List[List[List[str]]] = []
    counts: Counter = Counter()
    for caps, lens in zip(data[split]["encoded_captions"],
                          data[split]["lengths"]):
        image_refs = []
        for c, ln in zip(caps, lens):
            # words only: c = [<START>, w1..wn, <END>, pads], length = n+1,
            # so c[1:ln] = w1..wn — the SAME slice the validation metrics
            # use (evalx/metrics.py::score_captions).  The earlier
            # c[:ln-1] slice kept <START> in every ref AND the modal hyp
            # (a free matching unigram+bigram per caption) and dropped the
            # final word — it INFLATED the printed floors: the corrected
            # 64-noun floor is bleu4 0.0343 vs the 0.0803 the v4 soak was
            # (wrongly) judged against, so v4's best 0.0426 had in fact
            # already crossed the true no-image prior.
            toks = [itos[t] for t in c[1:max(ln, 1)]]
            image_refs.append(toks)
            counts.update([tuple(toks)])
        refs_tok.append(image_refs)
    modal = list(counts.most_common(1)[0][0])
    hyps = [modal] * len(refs_tok)
    return {f"bleu{n}": corpus_bleu(refs_tok, hyps, (1.0 / n,) * n)
            for n in (1, 2, 3, 4)}
