"""Serving CLI (sat_tpu/serve.py): directory -> JSONL captions."""

import json
import os

import numpy as np
import jax
import pytest
from PIL import Image

from sat_tpu.config import SATConfig
from sat_tpu.models.model import SATModel
from sat_tpu.serve import gather_images, main as serve_main
from sat_tpu.train.checkpoints import save_checkpoint

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


@pytest.fixture(scope="module")
def ckpt_and_images(tmp_path_factory):
    out = tmp_path_factory.mktemp("serve")
    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="squeezenet1_1", input_size=64,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24,
                    deep_output=True)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    ck = str(out / "m.ckpt")
    save_checkpoint(ck, model.cfg, {
        "params": jax.device_get(variables["params"]),
        "state": jax.device_get(variables["state"]), "step": 0, "epoch": 0})
    imgdir = out / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(imgdir / f"i{i}.png"))
        Image.fromarray(arr).save(str(imgdir / f"j{i}.jpg"), quality=90)
    return ck, str(imgdir)


def test_gather_images(ckpt_and_images):
    _, imgdir = ckpt_and_images
    paths = gather_images([imgdir])
    assert len(paths) == 10
    assert gather_images([os.path.join(imgdir, "*.jpg")]) == paths[5:] or \
        len(gather_images([os.path.join(imgdir, "*.jpg")])) == 5


def test_gather_images_literal_bracket_and_empty_glob(tmp_path, capsys):
    """A file literally named 'img[1].jpg' must be returned as-is (not glob-
    expanded away), and a glob matching nothing must warn on stderr."""
    p = tmp_path / "img[1].jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(str(tmp_path / "tmp.png"))
    os.rename(str(tmp_path / "tmp.png"), str(p).replace(".jpg", ".png"))
    lit = str(p).replace(".jpg", ".png")
    assert gather_images([lit]) == [lit]
    assert gather_images([str(tmp_path / "nope*.jpg")]) == []
    assert "matched nothing" in capsys.readouterr().err


def test_serve_jsonl_output(ckpt_and_images, tmp_path):
    ck, imgdir = ckpt_and_images
    out = str(tmp_path / "caps.jsonl")
    # batch 4 over 10 images exercises full batches + padded tail
    rc = serve_main(["--checkpoint", ck, "--images", imgdir, "--batch", "4",
                     "--beamk", "2", "--max_gen_length", "6",
                     "--precision", "32", "--output", out])
    assert rc == 0
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 10
    for r in recs:
        assert os.path.exists(r["image"])
        assert isinstance(r["caption"], str)
        assert np.isfinite(r["score"]) and np.isfinite(r["perplexity"])
        for w in r["caption"].split():
            assert w not in ("<START>", "<PAD>")


def test_serve_return_all(ckpt_and_images, tmp_path):
    ck, imgdir = ckpt_and_images
    out = str(tmp_path / "all.jsonl")
    rc = serve_main(["--checkpoint", ck, "--images",
                     os.path.join(imgdir, "i0.png"),
                     "--batch", "2", "--beamk", "3", "--max_gen_length", "6",
                     "--precision", "32", "--return_all", "--output", out])
    assert rc == 0
    (rec,) = [json.loads(l) for l in open(out)]
    assert len(rec["candidates"]) == 3
    scores = [c["score"] for c in rec["candidates"]]
    assert scores == sorted(scores, reverse=True)


def test_serve_corrupt_file_yields_error_record(ckpt_and_images, tmp_path):
    """A corrupt image must produce an error JSONL record, not kill the run."""
    ck, imgdir = ckpt_and_images
    bad = str(tmp_path / "corrupt.jpg")
    with open(bad, "w") as f:
        f.write("not an image at all")
    out = str(tmp_path / "mix.jsonl")
    rc = serve_main(["--checkpoint", ck, "--images", bad,
                     os.path.join(imgdir, "i0.png"), "--batch", "2",
                     "--beamk", "2", "--max_gen_length", "5",
                     "--precision", "32", "--output", out])
    assert rc == 0
    recs = {json.loads(l)["image"]: json.loads(l) for l in open(out)}
    assert "error" in recs[bad] and "caption" not in recs[bad]
    assert "caption" in recs[os.path.join(imgdir, "i0.png")]


def test_serve_vocab_tp_mesh_matches_dp(ckpt_and_images, tmp_path):
    """--mesh_shape 4 2 --mesh_axes data model (vocab tables sharded) must
    emit the same captions as the default data-parallel mesh."""
    ck, imgdir = ckpt_and_images
    out_dp = str(tmp_path / "dp.jsonl")
    out_tp = str(tmp_path / "tp.jsonl")
    base = ["--checkpoint", ck, "--images", imgdir, "--batch", "8",
            "--beamk", "2", "--max_gen_length", "6", "--precision", "32"]
    assert serve_main(base + ["--output", out_dp]) == 0
    assert serve_main(base + ["--mesh_shape", "4", "2",
                              "--mesh_axes", "data", "model",
                              "--output", out_tp]) == 0
    dp = {json.loads(l)["image"]: json.loads(l)["caption"] for l in open(out_dp)}
    tp = {json.loads(l)["image"]: json.loads(l)["caption"] for l in open(out_tp)}
    assert dp == tp and len(dp) == 10
