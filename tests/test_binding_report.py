"""tools/binding_report.py — the attribute-binding analysis for the
compositional soak task.

Pins: (1) the caption parser recovers every field from every grammar
template, including the relational template whose "left of"/"right of"
words collide with position vocabulary; (2) scene truth recovered from the
5 paraphrase references is exact; (3) the strict scorer credits partial
binding (right shape, wrong texture) that BLEU cannot see and assignment is
order-invariant; (4) a perfect captioner scores 1.0 across the board on a
real generated dataset while the modal-prior row does not."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import binding_report as br                                    # noqa: E402
from sat_tpu.data.compositional import (                       # noqa: E402
    make_compositional_dataset, noun_word)

N0, N1 = noun_word(0), noun_word(63)     # 64-noun rung endpoints
N2 = noun_word(513)                      # color 8, shape 0, texture 1


def test_parse_positional_templates():
    cap = f"a big {N0} in the top left and a tiny {N1} in the bottom right".split()
    a, b = br.parse_caption(cap)
    assert (a["noun"], a["size"], a["cell"]) == (N0, 1, 0)
    assert (b["noun"], b["size"], b["cell"]) == (N1, 0, 8)
    # template 2: position phrase PRECEDES the noun
    cap = (f"the upper middle shows a small {N0} while the center shows "
           f"a huge {N2}").split()
    a, b = br.parse_caption(cap)
    assert (a["cell"], a["size"]) == (1, 0)
    assert (b["cell"], b["size"], b["noun"]) == (4, 1, N2)
    # attributes decode through the bijective lexicon
    assert (a["color"], a["shape"], a["texture"]) == (0, 0, 0)
    assert (b["color"], b["shape"], b["texture"]) == (8, 0, 1)


def test_parse_relational_template_no_position_claims():
    # "left of" must NOT parse as the cell-3 position word "left"
    cap = f"a big {N0} left of a small {N1}".split()
    a, b = br.parse_caption(cap)
    assert a["cell"] is None and b["cell"] is None
    assert (a["noun"], b["noun"]) == (N0, N1)
    cap = f"a tiny {N1} above a large {N0}".split()
    a, b = br.parse_caption(cap)
    assert a["cell"] is None and b["cell"] is None
    # BOTH stated sizes must parse in the relational form: the second
    # object's segment starts at its noun, and the size adjective sits one
    # word before it across the segment boundary (regression: ni > s guard
    # dropped it, deflating every published size row)
    assert (a["size"], b["size"]) == (0, 1)


def test_scene_truth_majority_vote():
    refs = [
        f"a big {N0} in the top left and a tiny {N1} in the bottom right".split(),
        f"there is a large {N0} at the upper left with a small {N1} at the lower right".split(),
        f"a huge {N0} left of a little {N1}".split(),   # relational: no cells
        f"the top left shows a big {N0} while the bottom right shows a small {N1}".split(),
        f"a large {N0} sits near the upper left and a tiny {N1} sits near the lower right".split(),
    ]
    truth = br.scene_truth(refs)
    t0 = next(t for t in truth if t["noun"] == N0)
    t1 = next(t for t in truth if t["noun"] == N1)
    assert (t0["size"], t0["cell"]) == (1, 0)
    assert (t1["size"], t1["cell"]) == (0, 8)


def test_scorer_partial_binding_and_order_invariance():
    truth = [[
        {"noun": N0, "color": 0, "shape": 0, "texture": 0, "size": 1, "cell": 0},
        {"noun": N1, "color": 0, "shape": 7, "texture": 7, "size": 0, "cell": 8},
    ]]
    # right shape, wrong texture for object 0 (noun_word(1) = shape 0, tex 1)
    wrongtex = {"noun": noun_word(1), "color": 0, "shape": 0, "texture": 1,
                "size": 1, "cell": 0}
    exact1 = dict(truth[0][1])
    res = br.score_split([[wrongtex, exact1]], truth)
    assert res["noun"] == 0.5 and res["texture"] == 0.5
    assert res["shape"] == 1.0 and res["size"] == 1.0 and res["cell"] == 1.0
    # swapped emission order: assignment must recover the same scores
    res_sw = br.score_split([[exact1, wrongtex]], truth)
    assert res == res_sw
    # empty caption: strict denominators count the misses
    res0 = br.score_split([[]], truth)
    assert res0["noun"] == 0.0 and res0["assigned"] == 0.0


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("binding")
    return make_compositional_dataset(
        str(out), n_train=4, n_val=24, n_test=4, image_size=48,
        n_nouns=64, json_name="tiny64")


def test_report_perfect_captioner_vs_prior(tiny_dataset):
    import json
    data = json.load(open(tiny_dataset))
    refs = br.decode_refs(data, "val")
    # a perfect captioner: echo a POSITIONAL reference for each image
    def positional(image_refs):
        for cap in image_refs:
            objs = br.parse_caption(cap)
            if len(objs) == 2 and all(o["cell"] is not None for o in objs):
                return cap
        return image_refs[0]
    gens = [positional(r) for r in refs]
    rep = br.report(gens, tiny_dataset, "val")
    m = rep["rows"]["model"]
    for f in ("noun", "color", "shape", "texture", "size", "cell"):
        assert m[f] == pytest.approx(1.0), f
    # the 64-noun prefix is single-color: support shows the trivial axis
    assert rep["support"]["color"] == 1
    assert rep["support"]["noun"] <= 64
    # the no-image prior cannot match a perfect captioner on nouns
    assert rep["rows"]["prior"]["noun"] < 0.5
    assert rep["rows"]["uniform"]["cell"] == pytest.approx(1 / 9, abs=0.05)
    # the report accounts for every image: scored + excluded = decoded
    assert rep["n_images"] + rep["excluded_duplicate_noun"] == len(refs)


def test_duplicate_noun_scenes_detected_and_excluded():
    # same noun twice in one reference -> ambiguous noun-keyed truth
    dup = [f"a big {N0} in the top left and a tiny {N0} in the bottom right".split()]
    ok = [f"a big {N0} in the top left and a tiny {N1} in the bottom right".split()]
    assert br.has_duplicate_noun(dup)
    assert not br.has_duplicate_noun(ok)


def test_pair_score_uses_size_to_break_ties():
    # two truth objects identical on every field but size (the same-noun
    # case): assignment must pair by size, not emission order
    base = {"noun": N0, "color": 0, "shape": 0, "texture": 0, "cell": None}
    truth = [[{**base, "size": 1, "cell": 0}, {**base, "size": 0, "cell": 8}]]
    # generated captions state size but no position: ONLY size can pair them
    small = {**base, "size": 0}
    big = {**base, "size": 1}
    for gens in ([small, big], [big, small]):
        res = br.score_split([gens], truth)
        assert res["size"] == 1.0
