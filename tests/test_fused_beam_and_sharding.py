"""Fused-kernel beam search parity + batch-sharded decoding over the mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from sat_tpu.config import SATConfig
from sat_tpu.models import decoder as D
from sat_tpu.decode.beam import beam_search, greedy_decode
from sat_tpu.parallel.mesh import create_mesh, data_sharding, replicate_tree
import pytest

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def make_cfg(v=31):
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    return SATConfig(vocab_size=v, vocab_stoi=stoi, embed_dim=10, encoder_dim=8,
                     attention_dim=8, decoder_dim=16, deep_output=True)


def test_fused_beam_matches_jnp_beam():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    annots = jnp.asarray(np.random.default_rng(7).normal(
        size=(3, 6, cfg.encoder_dim)).astype(np.float32))
    a = beam_search(params, cfg, annots, beamk=4, max_gen_length=12,
                    rescore_method="LN")
    b = beam_search(params, cfg, annots, beamk=4, max_gen_length=12,
                    rescore_method="LN", fused=True)
    np.testing.assert_array_equal(np.array(a.tokens), np.array(b.tokens))
    np.testing.assert_allclose(np.array(a.scores), np.array(b.scores), atol=1e-5)


def test_fused_falls_back_with_noise_and_multilayer():
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(0), cfg)
    annots = jnp.ones((2, 6, cfg.encoder_dim))
    # noisy: fused flag must not change semantics (silently uses jnp path)
    r1 = beam_search(params, cfg, annots, beamk=2, max_gen_length=6,
                     decoder_noise=0.5, rng=jax.random.PRNGKey(1), fused=True)
    r2 = beam_search(params, cfg, annots, beamk=2, max_gen_length=6,
                     decoder_noise=0.5, rng=jax.random.PRNGKey(1), fused=False)
    np.testing.assert_array_equal(np.array(r1.tokens), np.array(r2.tokens))


def test_batch_sharded_decode_over_mesh():
    """Decode with the batch sharded over the 8-device mesh: same captions as
    unsharded (the multi-chip serving path)."""
    cfg = make_cfg()
    params = D.init_decoder_params(jax.random.PRNGKey(3), cfg)
    mesh = create_mesh((8,), ("data",), jax.devices())
    annots_np = np.random.default_rng(1).normal(
        size=(16, 6, cfg.encoder_dim)).astype(np.float32)

    ref = beam_search(params, cfg, jnp.asarray(annots_np), beamk=3,
                      max_gen_length=10, rescore_method="LN")

    params_r = replicate_tree(jax.device_get(params), mesh)
    annots_s = jax.device_put(annots_np, data_sharding(mesh))
    fn = jax.jit(lambda p, a: beam_search(p, cfg, a, beamk=3,
                                          max_gen_length=10,
                                          rescore_method="LN").tokens)
    toks = fn(params_r, annots_s)
    assert len(toks.sharding.device_set) == 8  # stayed sharded end-to-end
    np.testing.assert_array_equal(np.array(toks), np.array(ref.tokens))
