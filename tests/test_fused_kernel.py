"""Fused Pallas decoder-step kernel vs the pure-jnp reference path
(SURVEY.md §4 item (d): parity tests of the Pallas kernel against the jnp
implementation). Runs in interpreter mode on the CPU test mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models import decoder as D
from sat_tpu.kernels.decoder_step import (FusedWeights, fused_decoder_step,
                                          fused_output_logits,
                                          pack_fused_weights)

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def make_cfg(**kw):
    base = dict(vocab_size=50, embed_dim=16, encoder_dim=24, attention_dim=8,
                decoder_dim=32, decoder_layers=1, deep_output=True)
    base.update(kw)
    return SATConfig(**base)


@pytest.mark.parametrize("deep_output,weight_tying", [(True, False),
                                                      (False, False),
                                                      (True, True)])
def test_fused_step_matches_jnp(deep_output, weight_tying):
    cfg = make_cfg(deep_output=deep_output, weight_tying=weight_tying)
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, L = 10, 7
    annots = jnp.array(rng.normal(size=(n, L, cfg.encoder_dim)).astype(np.float32))
    att_enc = D.attention_precompute(params, annots)
    embed = jnp.array(rng.normal(size=(n, cfg.embed_dim)).astype(np.float32))
    h = jnp.array(rng.normal(size=(1, n, cfg.decoder_dim)).astype(np.float32))
    c = jnp.array(rng.normal(size=(1, n, cfg.decoder_dim)).astype(np.float32))

    ref_logits, ref_h, ref_c, ref_zt, ref_alpha = D.decoder_step(
        params, cfg, embed, h, c, annots, att_enc)

    fw = pack_fused_weights(params, cfg)
    t, h2, c2, zt, alpha = fused_decoder_step(
        fw, cfg, embed, h[0], c[0], annots, att_enc, tile_n=8, interpret=True)
    logits = fused_output_logits(params, cfg, t)

    np.testing.assert_allclose(np.array(h2), np.array(ref_h[0]), atol=2e-5)
    np.testing.assert_allclose(np.array(c2), np.array(ref_c[0]), atol=2e-5)
    np.testing.assert_allclose(np.array(zt), np.array(ref_zt), atol=2e-5)
    np.testing.assert_allclose(np.array(alpha), np.array(ref_alpha), atol=2e-5)
    np.testing.assert_allclose(np.array(logits), np.array(ref_logits),
                               atol=5e-5, rtol=1e-4)


def test_fused_step_padding_path():
    """n not divisible by tile_n exercises the pad/slice path."""
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    n, L = 13, 5
    annots = jnp.array(rng.normal(size=(n, L, cfg.encoder_dim)).astype(np.float32))
    att_enc = D.attention_precompute(params, annots)
    embed = jnp.array(rng.normal(size=(n, cfg.embed_dim)).astype(np.float32))
    h = jnp.array(rng.normal(size=(1, n, cfg.decoder_dim)).astype(np.float32))
    c = jnp.array(rng.normal(size=(1, n, cfg.decoder_dim)).astype(np.float32))
    ref_logits, ref_h, _, _, _ = D.decoder_step(params, cfg, embed, h, c,
                                                annots, att_enc)
    fw = pack_fused_weights(params, cfg)
    t, h2, *_ = fused_decoder_step(fw, cfg, embed, h[0], c[0], annots, att_enc,
                                   tile_n=8, interpret=True)
    logits = fused_output_logits(params, cfg, t)
    assert logits.shape == (n, cfg.vocab_size)
    np.testing.assert_allclose(np.array(h2), np.array(ref_h[0]), atol=2e-5)
    np.testing.assert_allclose(np.array(logits), np.array(ref_logits),
                               atol=5e-5, rtol=1e-4)
