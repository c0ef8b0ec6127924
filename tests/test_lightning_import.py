"""Reference-checkpoint import round trip: build a SAT-TPU model, inverse-map
its weights into a reference-style Lightning checkpoint dict (state_dict with
the reference's module names + hyper_parameters), import it back through
load_reference_checkpoint, and require IDENTICAL decode outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models.model import SATModel
from sat_tpu.models.lightning_import import load_reference_checkpoint
from sat_tpu.decode.beam import beam_search

from test_torch_import import torchvision_keys, flax_leaves


SHUFFLE_SEQ_IDX = {"conv1": "1", "stage2": "3", "stage3": "4",
                   "stage4": "5", "conv5": "6"}


def build_reference_ckpt(model, variables):
    """Inverse-map our variables into the reference's checkpoint format."""
    host = jax.device_get(variables)
    enc_p = host["params"]["encoder"]["backbone"]
    enc_s = host["state"]["batch_stats"]["backbone"]
    dec = host["params"]["decoder"]
    sd = {}

    def find(tree, name):
        node = tree
        for p in name.split("/"):
            node = node[p]
        return np.asarray(node)

    # encoder: flax -> torchvision keys -> reference Sequential indices
    for tkey, fname in torchvision_keys("shufflenet_v2_x0_5"):
        top, rest = tkey.split(".", 1)
        ref_key = f"encoder.{SHUFFLE_SEQ_IDX[top]}.{rest}"
        if fname.startswith("stats:"):
            sd[ref_key] = find(enc_s, fname[6:])
        elif fname.endswith("/kernel") or fname == "conv1/kernel" or \
                fname.endswith("kernel"):
            k = find(enc_p, fname)
            sd[ref_key] = k.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        else:
            sd[ref_key] = find(enc_p, fname)
    # appended 1x1 encoder_dim proj conv (Sequential index 7 for shufflenet)
    proj = host["params"]["encoder"]["proj"]
    sd["encoder.7.weight"] = np.asarray(proj["kernel"]).transpose(3, 2, 0, 1)
    sd["encoder.7.bias"] = np.asarray(proj["bias"])

    # decoder
    lin = lambda name, p: sd.update(
        {f"{name}.weight": np.asarray(p["w"]).T,
         **({f"{name}.bias": np.asarray(p["b"])} if "b" in p else {})})
    sd["embedding.weight"] = np.asarray(dec["embedding"])
    lin("init_lstm.factorize", dec["init_factorize"])
    lin("init_lstm.init", dec["init_proj"])
    lin("attention.encoder_att", dec["att_enc"])
    lin("attention.decoder_att", dec["att_dec"])
    lin("attention.f_att", dec["f_att"])
    lin("beta.0", dec["beta"])
    lin("output.hidden", dec["out_hidden"])
    lin("output.context", dec["out_context"])
    lin("output.output", dec["out_proj"])
    for lname, lp in dec["lstm"].items():
        l = lname.split("_")[1]
        sd[f"lstm.weight_ih_l{l}"] = np.asarray(lp["w_ih"]).T
        sd[f"lstm.weight_hh_l{l}"] = np.asarray(lp["w_hh"]).T
        sd[f"lstm.bias_ih_l{l}"] = np.asarray(lp["b_ih"])
        sd[f"lstm.bias_hh_l{l}"] = np.asarray(lp["b_hh"])

    return {"state_dict": sd, "hyper_parameters": model.cfg.to_dict()}


def test_reference_checkpoint_round_trip():
    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24,
                    deep_output=True)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    ckpt = build_reference_ckpt(model, variables)

    cfg2, variables2, grid2 = load_reference_checkpoint(ckpt)
    assert cfg2.encoder_arch == "shufflenet_v2_x0_5"
    assert cfg2.vocab_size == v and grid2 == model.grid_hw

    imgs = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3),
                                                       np.float32))
    a1 = model.encode(variables, imgs, train=False)
    model2 = SATModel(cfg2, grid2)
    a2 = model2.encode(variables2, imgs, train=False)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    r1 = beam_search(variables["params"]["decoder"], model.cfg, a1,
                     beamk=3, max_gen_length=8, rescore_method="LN")
    r2 = beam_search(variables2["params"]["decoder"], cfg2, a2,
                     beamk=3, max_gen_length=8, rescore_method="LN")
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    np.testing.assert_allclose(np.asarray(r1.scores), np.asarray(r2.scores),
                               atol=1e-6)
