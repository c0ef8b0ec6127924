"""L6 analysis-tool tests: visualizer, decode search, temperature scaling,
projector export — all driven from a self-contained checkpoint (the
reference's tool entry pattern, SURVEY.md §3.3)."""

import os

import numpy as np
import jax
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.dataset import CaptionDataset
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.models.model import SATModel
from sat_tpu.train.checkpoints import (load_model_from_checkpoint,
                                       save_checkpoint)

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("tools")
    json_path = make_synthetic_dataset(str(out), n_train=8, n_val=6, n_test=6,
                                       image_size=32, max_cap_length=8)
    import json as _json
    js = _json.load(open(json_path))
    cfg = SATConfig(json=json_path, input_size=32,
                    encoder_arch="mobilenet_v3_small", encoder_dim=24,
                    embed_dim=16, attention_dim=16, decoder_dim=32,
                    deep_output=True, vocab_stoi=js["vocab_stoi"],
                    vocab_size=js["vocab_size"], max_cap_length=js["max_cap_length"])
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    ckpt = str(out / "model.ckpt")
    save_checkpoint(ckpt, model.cfg, {
        "params": jax.device_get(variables["params"]),
        "state": jax.device_get(variables["state"]),
        "step": 0, "epoch": 0})
    return json_path, ckpt


def test_visualizer(setup, tmp_path):
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    ds = CaptionDataset(json_path, "val")
    from sat_tpu.evalx.visualize import make_visual
    out = make_visual(model, variables, ds, idx=0, beamk=2, max_gen_length=6,
                      show_topk=2, out_dir=str(tmp_path / "viz"))
    assert os.path.exists(out) and out.endswith("_result.jpg")
    assert os.path.getsize(out) > 1000


def test_visualizer_arbitrary_image(setup, tmp_path):
    """--image path: caption any file, overlays rendered, no GT panel."""
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    ds = CaptionDataset(json_path, "val")
    from sat_tpu.evalx.visualize import make_visual
    out = make_visual(model, variables, image_path=ds.img_paths[1],
                      beamk=2, max_gen_length=6,
                      out_dir=str(tmp_path / "viz2"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_decode_search_csv(setup, tmp_path):
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    ds = CaptionDataset(json_path, "test")
    from sat_tpu.evalx.search import correlation_report, run_search
    csv = str(tmp_path / "evals.csv")
    df = run_search(model, variables, ds, n_trials=3, batches_per_trial=1,
                    batch_size=4, csv_path=csv, max_gen_length=6,
                    beamk_range=(2, 3), seed=0)
    assert len(df) == 3 and os.path.exists(csv)
    assert {"beamk", "temperature", "bleu4", "gleu",
            "seconds_per_batch"} <= set(df.columns)
    corr = correlation_report(csv)
    assert "bleu4" in corr.columns
    # accumulated searches append to the existing CSV across invocations
    # (reference: evaluate.ipynb cell 4 seeds `results` from data/results.csv);
    # a prior bug re-read the CSV only at trial 0 so trial>=1 writes clobbered it
    import pandas as pd
    run_search(model, variables, ds, n_trials=2, batches_per_trial=1,
               batch_size=4, csv_path=csv, max_gen_length=6,
               beamk_range=(2, 3), seed=1)
    assert len(pd.read_csv(csv)) == 5


def test_collect_logits_max_batches_boundary(setup):
    """collect_logits honors max_batches exactly (was off-by-one: i > max)."""
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    ds = CaptionDataset(json_path, "val")
    from sat_tpu.evalx.temperature import collect_logits
    l1, t1 = collect_logits(model, variables, ds, batch_size=2, max_batches=1)
    l2, t2 = collect_logits(model, variables, ds, batch_size=2, max_batches=2)
    assert len(l1) < len(l2) and len(l1) == len(t1) and len(l2) == len(t2)


def test_temperature_scaling(setup):
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    ds = CaptionDataset(json_path, "val")
    from sat_tpu.evalx.temperature import collect_logits, fit_temperature
    logits, targets = collect_logits(model, variables, ds, batch_size=3,
                                     max_batches=1)
    assert logits.ndim == 2 and len(logits) == len(targets)
    t = fit_temperature(logits, targets, steps=30)
    assert 0.1 < t < 5.0 and np.isfinite(t)


def test_temperature_recovers_known_scale():
    """Calibrating logits that were mis-scaled by 2x should find T ~ 2."""
    rng = np.random.default_rng(0)
    n, v = 4000, 20
    true_logits = rng.normal(size=(n, v)).astype(np.float32) * 3
    probs = np.exp(true_logits) / np.exp(true_logits).sum(-1, keepdims=True)
    targets = np.array([rng.choice(v, p=p) for p in probs])
    from sat_tpu.evalx.temperature import fit_temperature
    t = fit_temperature(true_logits * 2.0, targets, steps=200)
    assert 1.6 < t < 2.4, t


def test_projector_export(setup, tmp_path):
    json_path, ckpt = setup
    model, variables, _ = load_model_from_checkpoint(ckpt)
    from sat_tpu.evalx.projector import export_embeddings
    out = export_embeddings(model, variables, str(tmp_path / "emb"))
    assert os.path.exists(out) and len(os.listdir(out)) > 0
