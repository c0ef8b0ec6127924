"""evaluate CLI (evalx/evaluate.py): metric bundle from either checkpoint
format — the BLEU-parity harness entry point."""

import json

import numpy as np
import jax
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.data.preprocess import make_synthetic_dataset
from sat_tpu.evalx.evaluate import main as eval_main
from sat_tpu.models.model import SATModel
from sat_tpu.train.checkpoints import save_checkpoint

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("ev")
    ds_path = make_synthetic_dataset(str(out), n_train=8, n_val=6, n_test=6,
                                     image_size=32, max_cap_length=8)
    js = json.load(open(ds_path))
    v = js["vocab_size"]
    cfg = SATConfig(json=ds_path, encoder_arch="shufflenet_v2_x0_5",
                    input_size=32, encoder_dim=24, vocab_size=v,
                    vocab_stoi=js["vocab_stoi"], embed_dim=12,
                    attention_dim=12, decoder_dim=24, deep_output=True,
                    max_cap_length=js["max_cap_length"])
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    sat_ckpt = str(out / "m.ckpt")
    save_checkpoint(sat_ckpt, model.cfg, {
        "params": jax.device_get(variables["params"]),
        "state": jax.device_get(variables["state"]), "step": 0, "epoch": 0})
    return ds_path, sat_ckpt, model, variables


def test_evaluate_sat_checkpoint(setup, capsys):
    ds_path, sat_ckpt, _, _ = setup
    metrics = eval_main(["--checkpoint", sat_ckpt, "--json", ds_path,
                         "--split", "test", "--batch", "4", "--beamk", "2",
                         "--max_gen_length", "5"])
    assert {"bleu1", "bleu4", "gleu", "cosine_similarity",
            "perplexity"} <= set(metrics)
    assert all(np.isfinite(v) for v in metrics.values())
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["split"] == "test" and rec["beamk"] == 2


def test_evaluate_lightning_checkpoint_autodetect(setup, tmp_path):
    """A torch-saved reference-format .ckpt goes through the importer and
    produces the same metrics as the SAT-TPU checkpoint of the same model."""
    torch = pytest.importorskip("torch")
    from sat_tpu.models.lightning_export import build_lightning_checkpoint

    ds_path, sat_ckpt, model, variables = setup
    lk = build_lightning_checkpoint(model.cfg, variables)
    lk["state_dict"] = {k: torch.from_numpy(np.asarray(v, np.float32).copy())
                        for k, v in lk["state_dict"].items()}
    ref_ckpt = str(tmp_path / "ref.ckpt")
    torch.save(lk, ref_ckpt)

    args = ["--json", ds_path, "--split", "test", "--batch", "4",
            "--beamk", "2", "--max_gen_length", "5"]
    m_ref = eval_main(["--checkpoint", ref_ckpt] + args)
    m_sat = eval_main(["--checkpoint", sat_ckpt] + args)
    for k in m_sat:
        assert m_ref[k] == pytest.approx(m_sat[k], abs=1e-5), k
