"""Full-model API tests: caption() contract, image helpers, vocab round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models.model import SATModel
from sat_tpu.utils.images import (crop_center, crop_max_square, load_square,
                                  prepare_image, time_to_string)
from sat_tpu.vocab import Vocab


@pytest.fixture(scope="module")
def model_and_vars():
    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="mobilenet_v3_small", input_size=32,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24,
                    deep_output=True)
    return SATModel.create(cfg, jax.random.PRNGKey(0))


def test_caption_contract(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.default_rng(0).random((3, 32, 32, 3),
                                                       np.float32))
    caps, scores, alphas, ppl = model.caption(variables, imgs, beamk=2,
                                              max_gen_length=6,
                                              rescore_method="LN")
    assert len(caps) == 3
    gh, gw = model.grid_hw
    for c, a in zip(caps, alphas):
        assert a.shape == (len(c), gh, gw)
    caps_all, s_all, _, _ = model.caption(variables, imgs, beamk=2,
                                          max_gen_length=6, return_all=True)
    assert len(caps_all[0]) == 2
    assert s_all[0] == sorted(s_all[0], reverse=True)


def test_image_helpers(tmp_path):
    from PIL import Image
    arr = np.zeros((40, 60, 3), np.uint8)
    arr[:, :30] = 200
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    sq = load_square(p, size=16)
    assert sq.size == (16, 16)
    img = Image.fromarray(arr)
    assert crop_center(img, 10, 10).size == (10, 10)
    assert crop_max_square(img, 8).size == (8, 8)
    x = prepare_image(img, size=12)
    assert x.shape == (1, 12, 12, 3) and 0 <= x.min() and x.max() <= 1
    assert time_to_string(30) == "30.00 seconds"
    assert time_to_string(90) == "1.50 minutes"
    assert time_to_string(7200) == "2.00 hours"


def test_vocab_round_trip():
    from collections import Counter
    v = Vocab.build(Counter({"cat": 10, "dog": 8, "rare": 2}), min_count=5)
    assert v.stoi("cat") == 1 and v.stoi("dog") == 2
    assert v.stoi("rare") == v.unk_idx  # below min_count
    enc = v.encode(["cat", "dog"], max_cap_length=4)
    assert enc == [v.start_idx, 1, 2, v.end_idx, 0, 0]
    assert v.decode(enc, remove_special=True) == ["cat", "dog"]


def test_maybe_initialize_distributed_noop():
    from sat_tpu.parallel.mesh import maybe_initialize_distributed
    assert maybe_initialize_distributed() is False  # no coordinator env here
