"""Attribute-binding report for the compositional soak task.

BLEU-4 against a modal-template prior is a blunt instrument for the question
the compositional ladder actually asks — *did the model bind visual
attributes to words?* — because a captioner can beat or lose to the template
floor for reasons that have nothing to do with binding (clause order, synonym
choice, caption length).  This tool measures binding DIRECTLY: it decodes a
split with a trained checkpoint, parses each generated caption back into
structured objects (noun -> color/shape/texture via the bijective lexicon of
sat_tpu/data/compositional.py, plus size word and grid-position phrase), and
scores every field against the scene truth recovered from the 5 references.

Because the noun lexicon is bijective with (color, shape, texture), a wrong
noun still carries signal: "the model names a noun with the right shape and
texture but wrong color" is PARTIAL binding that corpus BLEU cannot see.
Two baselines make every row falsifiable:

* ``prior``  — the corpus's modal caption pushed through the same parser and
  scorer (the no-image captioner the BLEU floor models);
* ``uniform`` / ``modal`` chance — analytic constant-predictor rates from the
  split's empirical truth marginals.

Note on the ``--nouns`` ladder geometry: noun index = (color*8+shape)*8 +
texture, so the first-N prefix restricts COLOR first — the 64-noun rung is
single-color (pure shape x texture binding, color_acc trivially 1.0) and the
256-noun rung spans 4 colors.  The report prints the per-attribute support
so the trivial axes are visible.

Reference analogue: none — the reference's quality evidence is COCO BLEU
(readme.md:195-203); this exists because real COCO is unavailable here and
the synthetic task's truth IS recoverable.

Usage:
    python tools/binding_report.py --checkpoint /tmp/sat_soak/best_n64.ckpt \
        [--json .../compositional_64.json] [--split val] [--beamk 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_tpu.data.compositional import (  # noqa: E402
    N_NOUNS, _N_SHAPES, _N_TEXTURES, _POS_SYN, _SIZE_SYN, noun_word)

# noun word -> (color, shape, texture); bijective by construction
NOUN_ATTRS: Dict[str, Tuple[int, int, int]] = {
    noun_word(i): (i // (_N_SHAPES * _N_TEXTURES),
                   (i // _N_TEXTURES) % _N_SHAPES,
                   i % _N_TEXTURES)
    for i in range(N_NOUNS)}

_SIZE_OF_WORD = {w: gi for gi, group in enumerate(_SIZE_SYN) for w in group}
# all (cell, variant) pairs, longest variants first so "top left" (cell 0)
# wins over its substrings "top" (cell 1) and "left" (cell 3)
_CELL_VARIANTS: List[Tuple[int, Tuple[str, ...]]] = sorted(
    ((cell, v) for cell, variants in enumerate(_POS_SYN) for v in variants),
    key=lambda cv: -len(cv[1]))
# clause separators between the two object phrases (templates 0-3); the
# relational template 4 has NO separator — and its "left of"/"right of"
# relation words collide with position vocabulary, so a caption whose nouns
# are not conjunction-separated contributes no position claims at all
_CONJ = ("and", "while", "with")


def _find_cell(words: Sequence[str]) -> Optional[int]:
    """First longest-match grid cell named by a contiguous phrase, if any."""
    taken = [False] * len(words)
    best: Optional[Tuple[int, int]] = None   # (start, cell)
    for cell, variant in _CELL_VARIANTS:
        L = len(variant)
        for s in range(0, len(words) - L + 1):
            if any(taken[s:s + L]):
                continue
            if tuple(words[s:s + L]) == variant:
                for t in range(s, s + L):
                    taken[t] = True
                if best is None or s < best[0]:
                    best = (s, cell)
    return None if best is None else best[1]


def parse_caption(words: Sequence[str]) -> List[Dict]:
    """Parse one caption into <=2 structured objects.

    Returns [{noun, color, shape, texture, size, cell}] for the first two
    noun-lexicon words; size/cell are None when the caption does not state
    them (or states them unparseably)."""
    noun_pos = [i for i, w in enumerate(words) if w in NOUN_ATTRS][:2]
    if not noun_pos:
        return []
    if len(noun_pos) == 2:
        splits = [i for i in range(noun_pos[0] + 1, noun_pos[1])
                  if words[i] in _CONJ]
        if splits:
            segments = [(0, splits[0]), (splits[0] + 1, len(words))]
        else:       # relational form: neither object carries a position
            segments = [(0, noun_pos[1]), (noun_pos[1], len(words))]
        relational = not splits
    else:
        segments = [(0, len(words))]
        relational = False
    objs = []
    for (s, e), ni in zip(segments, noun_pos):
        noun = words[ni]
        color, shape, texture = NOUN_ATTRS[noun]
        # a size adjective immediately precedes its noun in every template,
        # including ACROSS the relational split point (segment 2 starts AT
        # its noun, so guarding on ni > s dropped that object's stated size);
        # non-size predecessors (a/the/relation words) just miss the lookup
        size = _SIZE_OF_WORD.get(words[ni - 1]) if ni > 0 else None
        cell = None if relational else _find_cell(words[s:e])
        objs.append({"noun": noun, "color": color, "shape": shape,
                     "texture": texture, "size": size, "cell": cell})
    return objs


def scene_truth(ref_caps: Sequence[Sequence[str]]) -> List[Dict]:
    """Recover the two-object scene truth by majority vote over the 5
    references (paraphrases vary template/synonyms, never the facts; the
    relational template omits positions, so cell truth needs >=1
    positional reference — else it stays None and is excluded)."""
    noun_counts: Counter = Counter()
    votes: Dict[str, Dict[str, Counter]] = {}
    for cap in ref_caps:
        for obj in parse_caption(cap):
            noun_counts[obj["noun"]] += 1
            v = votes.setdefault(obj["noun"],
                                 {"size": Counter(), "cell": Counter()})
            if obj["size"] is not None:
                v["size"][obj["size"]] += 1
            if obj["cell"] is not None:
                v["cell"][obj["cell"]] += 1
    truth = []
    for noun, _ in noun_counts.most_common(2):
        color, shape, texture = NOUN_ATTRS[noun]
        v = votes[noun]
        truth.append({
            "noun": noun, "color": color, "shape": shape, "texture": texture,
            "size": v["size"].most_common(1)[0][0] if v["size"] else None,
            "cell": v["cell"].most_common(1)[0][0] if v["cell"] else None})
    return truth


_FIELDS = ("noun", "color", "shape", "texture", "size", "cell")


def has_duplicate_noun(ref_caps: Sequence[Sequence[str]]) -> bool:
    """True when the scene's two objects drew the SAME noun (make_split
    samples noun indices independently, ~1/n_nouns of images): scene_truth
    keys votes by noun, so such scenes collapse into one truth object with
    size/cell votes mixed across both — corrupting the denominators.  Any
    single reference mentioning a noun twice is proof (every reference
    describes both objects)."""
    for cap in ref_caps:
        nouns = [o["noun"] for o in parse_caption(cap)]
        if len(nouns) != len(set(nouns)):
            return True
    return False


def _pair_score(g: Dict, t: Dict) -> int:
    # every scored field participates so ties (e.g. same-noun scenes) are
    # broken by whatever attribute CAN disambiguate, not by emission order
    s = 3 * (g["noun"] == t["noun"])
    s += sum(g[f] == t[f] for f in ("color", "shape", "texture"))
    s += (g["cell"] is not None and g["cell"] == t["cell"])
    s += (g["size"] is not None and g["size"] == t["size"])
    return s


def score_split(gen_objs_per_img: Sequence[List[Dict]],
                truth_per_img: Sequence[List[Dict]]) -> Dict[str, float]:
    """Strict accuracies: denominator = all truth objects (cell rows: those
    with known truth cell); a truth object with no assigned generated noun
    counts as a miss on every field.  `emitted` = mean parsed objects per
    caption, `assigned` = fraction of truth objects that got one."""
    hits = Counter()
    denom = Counter()
    n_emit = 0
    for gens, truth in zip(gen_objs_per_img, truth_per_img):
        n_emit += len(gens)
        if len(truth) == 2 and len(gens) == 2:
            a, b = truth
            if (_pair_score(gens[0], a) + _pair_score(gens[1], b)
                    >= _pair_score(gens[0], b) + _pair_score(gens[1], a)):
                pairs = [(gens[0], a), (gens[1], b)]
            else:
                pairs = [(gens[0], b), (gens[1], a)]
        elif gens and truth:
            t = max(truth, key=lambda t: _pair_score(gens[0], t))
            pairs = [(gens[0], t)]
        else:
            pairs = []
        for t in truth:
            got = next((g for g, tt in pairs if id(tt) == id(t)), None)
            for f in _FIELDS:
                if f == "cell" and t["cell"] is None:
                    continue
                denom[f] += 1
                if got is not None and got[f] is not None \
                        and got[f] == t[f]:
                    hits[f] += 1
            denom["assigned"] += 1
            hits["assigned"] += got is not None
            if t["cell"] is not None:
                # coarse position credit: correct row / column of the 3x3
                denom["row"] += 1
                denom["col"] += 1
                if got is not None and got["cell"] is not None:
                    hits["row"] += got["cell"] // 3 == t["cell"] // 3
                    hits["col"] += got["cell"] % 3 == t["cell"] % 3
    out = {f: hits[f] / denom[f] if denom[f] else float("nan")
           for f in (*_FIELDS, "row", "col", "assigned")}
    out["emitted"] = n_emit / max(len(gen_objs_per_img), 1)
    return out


def chance_rows(truth_per_img: Sequence[List[Dict]]) -> Dict[str, Dict[str, float]]:
    """Constant-predictor baselines from the empirical truth marginals:
    `uniform` guesses uniformly over the observed support, `modal` always
    answers the most common value — the strongest image-blind predictor."""
    dists: Dict[str, Counter] = {f: Counter() for f in _FIELDS}
    for truth in truth_per_img:
        for t in truth:
            for f in _FIELDS:
                if t[f] is not None:
                    dists[f][t[f]] += 1
    uniform, modal = {}, {}
    for f in _FIELDS:
        total = sum(dists[f].values())
        if not total:
            uniform[f] = modal[f] = float("nan")
            continue
        uniform[f] = 1.0 / len(dists[f])
        modal[f] = dists[f].most_common(1)[0][1] / total
    for d in (uniform, modal):
        d["row"] = d["col"] = 1.0 / 3
        d["assigned"] = 1.0
        d["emitted"] = 2.0
    return {"uniform": uniform, "modal": modal,
            "support": {f: len(dists[f]) for f in _FIELDS}}


def decode_refs(data: dict, split: str) -> List[List[List[str]]]:
    itos = {int(v): k for k, v in data["vocab_stoi"].items()}
    refs = []
    for caps, lens in zip(data[split]["encoded_captions"],
                          data[split]["lengths"]):
        # c = [<START>, w1..wn, <END>, pads], length = n+1 -> words only
        # (same slice as evalx/metrics.py::score_captions)
        refs.append([[itos[t] for t in c[1:max(ln, 1)]]
                     for c, ln in zip(caps, lens)])
    return refs


def report(gen_word_caps: Sequence[List[str]], json_path: str,
           split: str = "val") -> Dict:
    """Full report dict from already-decoded generated captions (word
    lists).  Split into its own function so tests can drive the parser and
    scorer without a model."""
    data = json.load(open(json_path))
    refs = decode_refs(data, split)[:len(gen_word_caps)]
    # same-noun scenes make the noun-keyed truth recovery ambiguous —
    # exclude them from scoring (for the model AND every baseline) and
    # report how many were dropped
    keep = [i for i, r in enumerate(refs) if not has_duplicate_noun(r)]
    n_dup = len(refs) - len(keep)
    gen_word_caps = [gen_word_caps[i] for i in keep]
    refs = [refs[i] for i in keep]
    truth = [scene_truth(r) for r in refs]
    gens = [parse_caption(c) for c in gen_word_caps]

    counts: Counter = Counter(tuple(c) for r in refs for c in r)
    modal_cap = list(counts.most_common(1)[0][0])
    prior = [parse_caption(modal_cap)] * len(truth)

    chance = chance_rows(truth)
    rows = {"model": score_split(gens, truth),
            "prior": score_split(prior, truth),
            "uniform": chance["uniform"], "modal": chance["modal"]}
    return {"n_images": len(truth), "excluded_duplicate_noun": n_dup,
            "rows": rows, "support": chance["support"],
            "modal_caption": " ".join(modal_cap)}


def print_report(rep: Dict) -> None:
    cols = (*_FIELDS, "row", "col", "assigned", "emitted")
    sup = rep["support"]
    print(f"n_images={rep['n_images']}"
          + (f" (+{rep['excluded_duplicate_noun']} same-noun scenes excluded)"
             if rep.get("excluded_duplicate_noun") else "")
          + "  support: " + " ".join(f"{f}={sup[f]}" for f in _FIELDS))
    print(f"modal caption: {rep['modal_caption']}\n")
    print("| predictor | " + " | ".join(cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for name in ("model", "prior", "modal", "uniform"):
        r = rep["rows"][name]
        print(f"| {name} | " + " | ".join(
            f"{r[c]:.3f}" if r[c] == r[c] else "-" for c in cols) + " |")


def main(argv=None):
    from sat_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--json", default=None,
                   help="compositional dataset json (default: from ckpt)")
    p.add_argument("--split", default="val")
    p.add_argument("--batch", default=64, type=int)
    p.add_argument("--beamk", default=3, type=int)
    p.add_argument("--max_gen_length", default=20, type=int)
    p.add_argument("--limit_batches", default=None, type=int)
    a = p.parse_args(argv)

    from sat_tpu.data.dataset import CaptionDataset
    from sat_tpu.evalx.evaluate import evaluate
    from sat_tpu.train.checkpoints import load_any_checkpoint

    model, variables = load_any_checkpoint(a.checkpoint)
    json_path = a.json or model.cfg.json
    ds = CaptionDataset(json_path, a.split)
    metrics, caps = evaluate(
        model, variables, ds, batch_size=a.batch, beamk=a.beamk,
        max_gen_length=a.max_gen_length, rescore_method="LN",
        limit_batches=a.limit_batches, return_captions=True)
    words = [model.vocab.decode(c, remove_special=True) for c in caps]
    rep = report(words, json_path, a.split)
    rep["bleu"] = {k: round(float(v), 5) for k, v in metrics.items()
                   if k.startswith("bleu")}
    print_report(rep)
    print("\nbleu: " + json.dumps(rep["bleu"]))
    print(json.dumps({k: (v if k != "rows" else
                          {n: {c: round(x, 4) if x == x else None
                               for c, x in r.items()}
                           for n, r in v.items()})
                      for k, v in rep.items()}))
    return rep


if __name__ == "__main__":
    main()
