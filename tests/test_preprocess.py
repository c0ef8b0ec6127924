"""Offline preprocessor parity (reference: preprocess.ipynb cells 8-17):
Karpathy-split routing, caption cleaning, 5-ref padding, vocab construction,
encoding layout, and the GloVe matrix builder (cell 16)."""

import json

import numpy as np
import pytest

from sat_tpu.data.preprocess import (build_glove_matrix, clean_token,
                                     preprocess_karpathy)
from sat_tpu.vocab import Vocab, PAD, UNK, START, END


def karpathy_fixture(tmp_path):
    """A tiny Karpathy-format JSON covering every routing/cleaning case."""
    def img(name, split, sents):
        return {"filename": name, "split": split,
                "sentences": [{"raw": " ".join(t), "tokens": t} for t in sents]}

    common = [["a", "dog", "runs"], ["a", "dog", "sits", "down"],
              ["the", "dog", "waits"]]
    images = [
        # train: 3 sentences -> padded to 5 by duplication
        img("COCO_train2014_0.jpg", "train", common),
        # restval routes to train (readme.md:85)
        img("COCO_val2014_1.jpg", "restval", common + [["a", "cat"], ["a", "cat"], ["a", "cat"]]),
        # val: includes the filtered sentence + a misspelling + an overlong one
        img("COCO_val2014_2.jpg", "val",
            [["i", "am", "unable", "to", "see", "this"],
             ["man", "with", "Skiis", "and", "a", "Tolet"],
             ["a"] * 40] + common),
        # test split
        img("COCO_val2014_3.jpg", "test", common + common),
        # unknown split dropped entirely
        img("COCO_val2014_4.jpg", "weird", common),
    ]
    p = tmp_path / "karpathy.json"
    json.dump({"images": images}, open(p, "w"))
    return str(p)


def test_preprocess_karpathy_semantics(tmp_path):
    kp = karpathy_fixture(tmp_path)
    # min_count is STRICT (v > min_count), matching the reference's
    # `if v>min_count` (preprocess.ipynb cell 15); 0 keeps every word
    out = preprocess_karpathy(kp, str(tmp_path / "coco"),
                              str(tmp_path / "ds.json"), ref_sentences=5,
                              min_count=0, max_vocab=None, max_cap_length=26)
    # restval -> train; weird split dropped
    assert out["train"]["samples"] == 2
    assert out["val"]["samples"] == 1 and out["test"]["samples"] == 1
    # path routing by filename
    assert "train2014" in out["train"]["img_paths"][0]
    assert "val2014" in out["train"]["img_paths"][1]

    # every image has exactly 5 refs, padded by duplication
    for split in ("train", "val", "test"):
        caps = np.asarray(out[split]["encoded_captions"])
        lens = np.asarray(out[split]["lengths"])
        assert caps.shape[1] == 5 and lens.shape[1] == 5

    stoi = out["vocab_stoi"]
    vocab = Vocab(stoi)
    assert stoi["<PAD>"] == 0  # reference: <PAD>=0 (cell 15)
    for sp in (UNK, START, END):
        assert sp in stoi

    # the "i am unable to see" sentence was filtered: "unable" never entered
    # the vocab; misspellings were fixed ("skiis"->"skis", "tolet"->"toilet")
    assert "unable" not in stoi
    assert "skis" in stoi and "toilet" in stoi
    assert "skiis" not in stoi and "tolet" not in stoi

    # encoding layout: <START> w... <END> <PAD>* and length = n_words + 1
    caps = np.asarray(out["train"]["encoded_captions"])
    lens = np.asarray(out["train"]["lengths"])
    c, l = caps[0, 0], int(lens[0, 0])
    assert c[0] == stoi["<START>"]
    assert c[l] == stoi["<END>"]
    assert (c[l + 1:] == stoi["<PAD>"]).all()
    words = [vocab.itos(int(t)) for t in c[1:l]]
    assert words == ["a", "dog", "runs"]

    # max_cap_length shrinks to the longest observed caption (cell 10);
    # the 40-token caption was truncated to 26 first
    assert out["max_cap_length"] == 26
    assert caps.shape[2] == 26 + 2

    # strict min_count filtering: words with freq <= min_count drop to <UNK>
    out2 = preprocess_karpathy(kp, str(tmp_path / "coco"),
                               str(tmp_path / "ds2.json"), min_count=4,
                               max_vocab=None)
    stoi2 = out2["vocab_stoi"]
    assert "dog" in stoi2          # appears in many captions
    assert "toilet" not in stoi2   # appears once -> <UNK>


def test_preprocess_max_vocab_rank(tmp_path):
    kp = karpathy_fixture(tmp_path)
    out = preprocess_karpathy(kp, "coco", str(tmp_path / "d.json"),
                              min_count=0, max_vocab=6)
    # 4 specials + the 6 most frequent words? max_vocab bounds total size
    assert out["vocab_size"] <= 6 + 4
    assert "dog" in out["vocab_stoi"] and "a" in out["vocab_stoi"]


def test_clean_token():
    assert clean_token("Skiis") == "skis"
    assert clean_token("PORDUCE".lower()) == "produce"
    assert clean_token("Dog") == "dog"


def test_build_glove_matrix(tmp_path):
    stoi = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3,
            "dog": 4, "cat": 5, "zzz_oov": 6}
    vocab = Vocab(stoi)
    gp = tmp_path / "glove.txt"
    with open(gp, "w") as f:
        f.write("dog " + " ".join(str(0.1 * i) for i in range(10)) + "\n")
        f.write("cat " + " ".join(str(-0.2 * i) for i in range(10)) + "\n")
    mat, dim = build_glove_matrix(vocab, str(gp), 10, extend_dim=True)
    # extend_dim pads 1+10 -> 16 (next multiple of 8), so pad 6 (cell 16)
    assert dim == 16 and mat.shape == (7, 16)
    # PAD row all zero
    assert (mat[0] == 0).all()
    # known words: glove values then zero pad dims
    np.testing.assert_allclose(mat[4, :10], [0.1 * i for i in range(10)])
    assert (mat[4, 10:] == 0).all()
    # OOV rows random over the FULL extended dim, roughly N(0, 0.4)
    assert mat[6].std() > 0.05 and abs(mat[6]).max() < 4.0
    assert (mat[6, 10:] != 0).any()

    mat2, dim2 = build_glove_matrix(vocab, str(gp), 10, extend_dim=False)
    assert dim2 == 10 and mat2.shape == (7, 10)


def test_inspect_montage(tmp_path):
    """--inspect_images writes a caption-annotated montage (preprocess.ipynb
    cell 18's visual half; VERDICT r1 #8)."""
    from PIL import Image
    from sat_tpu.data.preprocess import inspect_dataset, make_synthetic_dataset
    json_path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=4,
                                       n_val=2, n_test=2, image_size=32,
                                       max_cap_length=6)
    out = str(tmp_path / "viz")
    inspect_dataset(json_path, n=3, image_dir=out)
    img = Image.open(f"{out}/inspect.jpg")
    assert img.size == (256, 3 * (256 + 24))
