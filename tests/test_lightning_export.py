"""Lightning exporter (sat_tpu/models/lightning_export.py).

Two validation layers:
* key/value agreement with the independently handwritten shufflenet inverse
  map in test_lightning_import.build_reference_ckpt (itself pinned to
  torchvision's published state_dict layout),
* export -> import round trips across encoder families: identical encode
  outputs and beam-search decodes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.decode.beam import beam_search
from sat_tpu.models.lightning_export import build_lightning_checkpoint
from sat_tpu.models.lightning_import import load_reference_checkpoint
from sat_tpu.models.model import SATModel

from test_lightning_import import build_reference_ckpt

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def tiny_cfg(arch, **kw):
    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    base = dict(encoder_arch=arch, input_size=64, encoder_dim=24,
                vocab_size=v, vocab_stoi=stoi, embed_dim=12, attention_dim=12,
                decoder_dim=24, deep_output=True)
    base.update(kw)
    return SATConfig(**base)


def test_exporter_matches_handwritten_shufflenet_oracle():
    cfg = tiny_cfg("shufflenet_v2_x0_5")
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    oracle = build_reference_ckpt(model, variables)["state_dict"]
    ours = build_lightning_checkpoint(model.cfg, variables)["state_dict"]
    extra = {k for k in ours if k.endswith("num_batches_tracked")}
    assert set(ours) - extra == set(oracle)
    for k in oracle:
        np.testing.assert_array_equal(np.asarray(ours[k]),
                                      np.asarray(oracle[k]), err_msg=k)


@pytest.mark.parametrize("arch", [
    "resnet18", "squeezenet1_1", "mobilenet_v3_small", "mobilenet_v2",
    "mnasnet0_5", "densenet121",
])
def test_export_import_round_trip(arch):
    cfg = tiny_cfg(arch)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(1))
    ckpt = build_lightning_checkpoint(model.cfg, variables)
    cfg2, variables2, grid2 = load_reference_checkpoint(ckpt)
    assert cfg2.encoder_arch == arch and grid2 == model.grid_hw

    imgs = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3),
                                                       np.float32))
    a1 = model.encode(variables, imgs, train=False)
    a2 = SATModel(cfg2, grid2).encode(variables2, imgs, train=False)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    r1 = beam_search(variables["params"]["decoder"], model.cfg, a1,
                     beamk=3, max_gen_length=8, rescore_method="LN")
    r2 = beam_search(variables2["params"]["decoder"], cfg2, a2,
                     beamk=3, max_gen_length=8, rescore_method="LN")
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_round_trip_weight_tying():
    """Tied output head: exported state_dict carries the tied tensor under
    output.output.weight (reference shares the tensors, model.py:198-199)."""
    cfg = tiny_cfg("squeezenet1_1", weight_tying=True)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(3))
    ckpt = build_lightning_checkpoint(model.cfg, variables)
    sd = ckpt["state_dict"]
    np.testing.assert_array_equal(sd["output.output.weight"],
                                  sd["embedding.weight"])
    assert "output.output.bias" not in sd
    cfg2, variables2, grid2 = load_reference_checkpoint(ckpt)
    imgs = jnp.asarray(np.random.default_rng(4).random((1, 64, 64, 3),
                                                       np.float32))
    a1 = model.encode(variables, imgs, train=False)
    a2 = SATModel(cfg2, grid2).encode(variables2, imgs, train=False)
    r1 = beam_search(variables["params"]["decoder"], model.cfg, a1,
                     beamk=2, max_gen_length=6, rescore_method="LN")
    r2 = beam_search(variables2["params"]["decoder"], cfg2, a2,
                     beamk=2, max_gen_length=6, rescore_method="LN")
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_cli_round_trip_through_torch_file(tmp_path):
    """SAT-TPU .ckpt -> export CLI -> torch .ckpt -> import CLI -> same decode."""
    torch = pytest.importorskip("torch")
    from sat_tpu.models import lightning_export, lightning_import
    from sat_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    cfg = tiny_cfg("shufflenet_v2_x0_5")
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(5))
    sat_in = str(tmp_path / "in.ckpt")
    save_checkpoint(sat_in, model.cfg, {
        "params": jax.device_get(variables["params"]),
        "state": jax.device_get(variables["state"]), "step": 7, "epoch": 2})
    ref = str(tmp_path / "ref.ckpt")
    lightning_export.main(["--input", sat_in, "--output", ref])
    loaded = torch.load(ref, map_location="cpu", weights_only=False)
    assert loaded["global_step"] == 7 and loaded["epoch"] == 2
    sat_out = str(tmp_path / "out.ckpt")
    lightning_import.main(["--input", ref, "--output", sat_out])
    cfg2, raw2 = load_checkpoint(sat_out)
    imgs = jnp.asarray(np.random.default_rng(6).random((1, 64, 64, 3),
                                                       np.float32))
    variables2 = jax.tree_util.tree_map(
        jnp.asarray, {"params": raw2["params"], "state": raw2["state"]})
    a1 = model.encode(variables, imgs, train=False)
    a2 = model.encode(variables2, imgs, train=False)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
