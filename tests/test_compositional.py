"""Compositional caption grammar (sat_tpu/data/compositional.py).

Pins the properties VERDICT r2 #6 asked the at-scale quality soak to have:
1k+ vocabulary, 8-18 token captions, 5 independent paraphrase references,
reference-schema JSON that the real data pipeline consumes, and a no-image
prior baseline clearly below a correct captioner's reachable BLEU."""

import json
import os

import numpy as np
import pytest

from sat_tpu.data.compositional import (
    N_NOUNS, color_diverse_nouns, grammar_words, make_compositional_dataset,
    noun_index, noun_word, prior_baseline_bleu, render_scene, _relation)


def test_lexicon_unique_and_sized():
    words = grammar_words()
    assert len(words) == len(set(words))
    assert len(words) > 1000          # the 1k+ vocab requirement
    nouns = [noun_word(i) for i in range(N_NOUNS)]
    assert len(set(nouns)) == N_NOUNS == 1024
    # bijection noun <-> (color, shape, texture)
    assert noun_index(3, 5, 7) == (3 * 8 + 5) * 8 + 7


def test_relation_geometry():
    assert _relation(0, 6) == ("above",)      # row 0 vs row 2, same col
    assert _relation(6, 0) == ("below",)
    assert _relation(3, 5) == ("left", "of")  # same row, col 0 vs 2
    assert _relation(5, 3) == ("right", "of")


def test_render_scene_paints_objects():
    nprng = np.random.default_rng(0)
    objs = [{"cell": 0, "color": 0, "shape": 0, "texture": 0, "size": 1},
            {"cell": 8, "color": 2, "shape": 1, "texture": 5, "size": 0}]
    img = render_scene(96, objs, nprng)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    # top-left cell contains red-ish pixels, bottom-right blue-ish
    tl = img[:32, :32].reshape(-1, 3).astype(int)
    br = img[64:, 64:].reshape(-1, 3).astype(int)
    assert (tl[:, 0] - tl[:, 2] > 80).any()
    assert (br[:, 2] - br[:, 0] > 80).any()


def test_color_diverse_lexicon():
    """VERDICT r3 #4a: the first-N slice is single-color; the diverse slice
    spans K colors with identical shape-texture combos per color."""
    ids = color_diverse_nouns(64, 8)
    assert len(ids) == len(set(ids)) == 64
    attrs = [(i // 64, (i // 8) % 8, i % 8) for i in ids]
    colors = {c for c, _, _ in attrs}
    assert colors == set(range(8))
    per_color = {c: sorted((s, t) for cc, s, t in attrs if cc == c)
                 for c in colors}
    combos = per_color[0]
    assert len(combos) == 8
    assert all(v == combos for v in per_color.values())


def test_color_diverse_dataset_spans_colors(tmp_path):
    path = make_compositional_dataset(
        str(tmp_path), n_train=16, n_val=8, n_test=8, image_size=48,
        noun_ids=color_diverse_nouns(16, 4), json_name="c4")
    d = json.load(open(path))
    stoi = d["vocab_stoi"]
    present = {w for w in stoi if w in
               {noun_word(i) for i in color_diverse_nouns(16, 4)}}
    assert len(present) == 16
    # nouns outside the slice never appear in the vocab
    outside = {noun_word(i) for i in range(N_NOUNS)} - present
    assert not (outside & set(stoi))


def test_obj_scale_grows_objects():
    nprng = np.random.default_rng(0)
    objs = [{"cell": 4, "color": 0, "shape": 1, "texture": 0, "size": 0}]
    small = render_scene(96, objs, np.random.default_rng(0), obj_scale=1.0)
    big = render_scene(96, objs, np.random.default_rng(0), obj_scale=2.0)
    bg = 105
    painted = lambda im: int((np.abs(im.astype(int) - bg) > 40).sum())
    assert painted(big) > 2 * painted(small)
    # and the clamp keeps a huge scale inside the cell (no exception, and
    # nothing painted outside the center cell's bounds)
    huge = render_scene(96, objs, np.random.default_rng(0), obj_scale=10.0)
    border = np.concatenate([huge[:30].ravel(), huge[-30:].ravel()])
    assert np.abs(border.astype(int) - bg).max() < 40


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("comp"))
    path = make_compositional_dataset(out, n_train=24, n_val=16, n_test=8,
                                      image_size=64, n_nouns=64)
    return path, json.load(open(path))


def test_schema_and_caption_stats(dataset):
    path, d = dataset
    assert set(d) >= {"vocab_stoi", "vocab_size", "max_cap_length",
                      "train", "val", "test"}
    assert d["max_cap_length"] == 18
    for split in ("train", "val", "test"):
        s = d[split]
        assert s["samples"] == len(s["img_paths"]) == len(s["encoded_captions"])
        for caps, lens in zip(s["encoded_captions"], s["lengths"]):
            assert len(caps) == len(lens) == 5
            for c, ln in zip(caps, lens):
                # encode() rows are START + max_cap_length words + END
                assert len(c) == d["max_cap_length"] + 2
                assert 8 <= ln <= 18        # the 8-18 token band (incl END)
                assert all(t != d["vocab_stoi"]["<UNK>"] for t in c)
    assert all(os.path.exists(p) for p in d["train"]["img_paths"])


def test_paraphrases_are_diverse(dataset):
    _, d = dataset
    distinct = [len({tuple(c) for c in caps}) for caps in
                d["train"]["encoded_captions"]]
    # 5 independent draws from >=5 templates x synonyms x 2 orders:
    # nearly every image gets >=3 distinct reference strings
    assert np.mean(distinct) > 2.5


def test_pipeline_consumes_dataset(dataset):
    path, d = dataset
    from sat_tpu.data.dataset import CaptionDataset
    ds = CaptionDataset(path, "train")
    assert ds.encoded_captions.shape == (24, 5, d["max_cap_length"] + 2)
    assert ds.num_refs == 5 and len(ds) == 24
    # captions decode back into grammar words
    words = set(grammar_words()) | {"<START>", "<END>", "<PAD>"}
    toks = ds.vocab.decode(ds.encoded_captions[0, 0])
    assert set(toks) <= words


def test_prior_baseline_below_oracle(dataset):
    path, d = dataset
    floor = prior_baseline_bleu(path)
    assert 0.0 <= floor["bleu4"] < 0.5
    # an oracle that answers each image's OWN first reference scores far
    # above the no-image prior -> the task is image-dependent
    from sat_tpu.evalx.metrics import corpus_bleu
    itos = {int(v): k for k, v in d["vocab_stoi"].items()}
    refs, hyps = [], []
    for caps, lens in zip(d["val"]["encoded_captions"], d["val"]["lengths"]):
        toks = [[itos[t] for t in c[:ln - 1]] for c, ln in zip(caps, lens)]
        refs.append(toks)
        hyps.append(toks[0])
    oracle = corpus_bleu(refs, hyps, (0.25,) * 4)
    assert oracle > floor["bleu4"] + 0.25
