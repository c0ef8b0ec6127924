"""Whole-loop greedy kernel parity vs the scan path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models import decoder as D
from sat_tpu.decode.beam import greedy_decode
from sat_tpu.kernels.greedy_loop import greedy_loop_supported

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def make_cfg(**kw):
    v = kw.pop("vocab_size", 31)
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    base = dict(vocab_size=v, vocab_stoi=stoi, embed_dim=10, encoder_dim=8,
                attention_dim=8, decoder_dim=16, deep_output=True)
    base.update(kw)
    return SATConfig(**base)


@pytest.mark.parametrize("deep", [True, False])
def test_loop_kernel_matches_scan(deep):
    cfg = make_cfg(deep_output=deep)
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    annots = jnp.asarray(np.random.default_rng(7).normal(
        size=(13, 6, cfg.encoder_dim)).astype(np.float32))
    a = greedy_decode(params, cfg, annots, max_gen_length=10)
    b = greedy_decode(params, cfg, annots, max_gen_length=10, fused="loop")
    np.testing.assert_array_equal(np.array(a.tokens), np.array(b.tokens))
    np.testing.assert_array_equal(np.array(a.lengths), np.array(b.lengths))
    np.testing.assert_allclose(np.array(a.scores), np.array(b.scores), atol=1e-5)
    np.testing.assert_allclose(np.array(a.alphas), np.array(b.alphas), atol=1e-6)


def test_loop_kernel_temperature():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(1), cfg)
    annots = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 6, cfg.encoder_dim)).astype(np.float32))
    a = greedy_decode(params, cfg, annots, max_gen_length=8, temperature=0.7)
    b = greedy_decode(params, cfg, annots, max_gen_length=8, temperature=0.7,
                      fused="loop")
    np.testing.assert_array_equal(np.array(a.tokens), np.array(b.tokens))
    np.testing.assert_allclose(np.array(a.raw_scores), np.array(b.raw_scores),
                               atol=1e-5)


def test_supported_gate():
    cfg = make_cfg(decoder_layers=2)
    assert not greedy_loop_supported(cfg, 49)
    big = make_cfg(vocab_size=60000, encoder_dim=2048, embed_dim=1024,
                   decoder_dim=2048)
    assert not greedy_loop_supported(big, 196)
