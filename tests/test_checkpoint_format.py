"""Checkpoint format stability: tests/data/golden_v1.ckpt was written by the
v0.1 format (msgpack payload + JSON config header, tests/data generator in
git history).  Loading it and decoding pinned inputs must keep working — a
failure here means a format change broke every previously saved checkpoint
(the reference's .ckpt files are its entire deployment story, SURVEY §3.3;
ours must be as durable)."""

import json
import os

import numpy as np
import jax

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "data", "golden_v1.ckpt")
EXPECT = os.path.join(HERE, "data", "golden_v1_expect.json")


def test_golden_checkpoint_loads_and_decodes():
    from sat_tpu.train.checkpoints import load_model_from_checkpoint
    from sat_tpu.decode.beam import beam_search

    model, variables, extra = load_model_from_checkpoint(GOLDEN)
    assert model.cfg.encoder_arch == "shufflenet_v2_x0_5"
    assert model.cfg.vocab_size == 24
    assert model.vocab.stoi("<END>") == 23
    assert int(extra.get("step", -1)) == 7 and int(extra.get("epoch", -1)) == 3

    # rng-free pinned input: numpy does not guarantee Generator stream
    # stability across releases (NEP 19), arange does not change
    imgs = (np.arange(2 * 32 * 32 * 3, dtype=np.float32)
            .reshape(2, 32, 32, 3) % 256.0) / 255.0
    annots = model.encode(variables, imgs, train=False)
    res = beam_search(variables["params"]["decoder"], model.cfg, annots,
                      beamk=2, max_gen_length=6, rescore_method="LN")
    want = json.load(open(EXPECT))["tokens"]
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(want))


def test_golden_header_readable_without_payload():
    """The JSON config header must stay independently parseable (tools read
    config/vocab without deserializing weights)."""
    from sat_tpu.train.checkpoints import read_checkpoint_config
    cfg = read_checkpoint_config(GOLDEN)
    assert cfg.vocab_size == 24 and cfg.decoder_dim == 12
