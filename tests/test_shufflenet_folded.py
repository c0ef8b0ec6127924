"""Whole-net shuffle-permutation folding (models/shufflenet_folded.py):
planner invariants, backbone parity vs the flax path, and full-model wiring.

The folded forward must be the SAME math as backbones.ShuffleNetV2 (eval) —
channel permutations ride in kernel gathers, never in activations — so
parity holds to fp-reassociation tolerance for every variant width."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.config import SATConfig
from sat_tpu.models.backbones import BACKBONES
from sat_tpu.models.model import SATModel
from sat_tpu.models.shufflenet_folded import (folded_shufflenet_features,
                                              plan_stages)

MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def _riffle(lam_left, c):
    """Reference semantics: out logical 2i <- left[i], 2i+1 <- y[i]."""
    out = np.empty(2 * c, int)
    out[0::2] = lam_left
    out[1::2] = np.arange(c)
    return out


@pytest.mark.parametrize("arch", ["shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
                                  "shufflenet_v2_x1_5", "shufflenet_v2_x2_0"])
def test_plan_invariants(arch):
    """The static layout plan must track the exact riffle permutation:
    simulate the physical channel flow with numpy and check every unit's
    pw1 reads exactly the logical right half, the concat reproduces the
    passthrough, and conv5's gather restores logical order."""
    stage_out = tuple(BACKBONES[arch].keywords["stage_out"])
    plans, final_lam = plan_stages(stage_out)
    # physical channel state as logical ids; stem = identity
    phys = np.arange(24)
    i = 0
    logical_next = 24  # fresh logical ids for conv outputs
    for out_ch, reps in zip(stage_out[:3], (4, 8, 4)):
        c = out_ch // 2
        for j in range(reps):
            plan = plans[i]
            i += 1
            if j == 0:
                assert plan[0] == "s2"
                # the fold must be a permutation of the incoming channels,
                # equal to the tracked physical layout
                np.testing.assert_array_equal(plan[1], phys)
                # output: left/right fresh, riffled logically
                phys = np.arange(2 * c)  # reset logical ids per unit
                lam = np.concatenate([2 * np.arange(c),
                                      2 * np.arange(c) + 1])
                phys = lam
            else:
                assert plan[0] == "s1"
                pos_right = plan[1]
                # pw1 kernel row i lands at pos_right[i], which must hold
                # logical channel c+i exactly
                np.testing.assert_array_equal(phys[pos_right],
                                              np.arange(c, 2 * c))
                # passthrough runs must cover exactly the logical left half
                kept = np.concatenate(
                    [np.arange(a, b + 1) for a, b in plan[2]])
                assert sorted(phys[kept]) == list(range(0, c))
                phys = np.concatenate([2 * phys[kept],
                                       2 * np.arange(c) + 1])
    # conv5 gather restores logical order
    np.testing.assert_array_equal(phys[np.argsort(phys)], np.arange(len(phys)))
    assert sorted(final_lam) == list(range(stage_out[2]))
    np.testing.assert_array_equal(phys, final_lam)


def _random_stats(variables, seed):
    """Randomize BN running stats so parity exercises the BN folds."""
    rng = np.random.default_rng(seed)

    def rnd(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, x.shape), x.dtype)
        if name == "var":
            return jnp.asarray(rng.random(x.shape) + 0.3, x.dtype)
        return x
    return jax.tree_util.tree_map_with_path(rnd, variables)


@pytest.mark.parametrize("arch", ["shufflenet_v2_x0_5", "shufflenet_v2_x1_0"])
def test_backbone_parity(arch):
    stage_out = tuple(BACKBONES[arch].keywords["stage_out"])
    m = BACKBONES[arch](train=False, fold_norm=(MEAN, STD))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    v = _random_stats(m.init(jax.random.PRNGKey(0), x), seed=1)
    ref = m.apply(v, x)
    got = folded_shufflenet_features(v["params"], v["batch_stats"], x,
                                     stage_out, MEAN, STD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-6, rtol=1e-5)


def _model(folded, encoder_dim=24, encoder_size=None):
    stoi = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3,
            **{f"w{i}": i for i in range(4, 32)}}
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64,
                    vocab_size=32, vocab_stoi=stoi, embed_dim=16,
                    attention_dim=16, decoder_dim=32,
                    encoder_dim=encoder_dim, encoder_size=encoder_size,
                    folded_encoder=folded)
    return SATModel.create(cfg, jax.random.PRNGKey(0))


def test_model_encode_parity_and_auto_policy():
    """model.encode must agree folded vs flax (fp order aside); the auto
    policy (None) engages for shufflenet_v2."""
    model_auto, variables = _model(folded=None)
    model_off, _ = _model(folded=False)
    rng = np.random.default_rng(2)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    a_auto = model_auto.encode(variables, im, train=False)
    a_off = model_off.encode(variables, im, train=False)
    assert a_auto.shape == a_off.shape
    np.testing.assert_allclose(np.asarray(a_auto), np.asarray(a_off),
                               atol=2e-5, rtol=1e-4)
    # explicit ON == auto
    model_on, _ = _model(folded=True)
    a_on = model_on.encode(variables, im, train=False)
    np.testing.assert_array_equal(np.asarray(a_on), np.asarray(a_auto))


def test_model_features_and_proj_pool_paths():
    """flatten=False (visualization) and the encoder_size pool path."""
    model_auto, variables = _model(folded=None, encoder_dim=16,
                                   encoder_size=1)
    model_off, _ = _model(folded=False, encoder_dim=16, encoder_size=1)
    rng = np.random.default_rng(3)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    f_auto = model_auto.encode_features(variables, im)
    f_off = model_off.encode_features(variables, im)
    assert f_auto.shape == f_off.shape == (2, 1, 1, 16)
    np.testing.assert_allclose(np.asarray(f_auto), np.asarray(f_off),
                               atol=2e-5, rtol=1e-4)


def test_train_path_unaffected():
    """Train mode keeps the flax module (BN batch stats live there)."""
    model_on, variables = _model(folded=True)
    model_off, _ = _model(folded=False)
    rng = np.random.default_rng(4)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    a_on, bs_on = model_on.encode(variables, im, train=True)
    a_off, bs_off = model_off.encode(variables, im, train=True)
    np.testing.assert_array_equal(np.asarray(a_on), np.asarray(a_off))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bs_on, bs_off)


def test_bf16_parity():
    """bf16 params + images (the bench configuration) stay within bf16
    rounding of the flax bf16 path."""
    model_on, variables = _model(folded=True)
    model_off, _ = _model(folded=False)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    vb = {"params": cast(variables["params"]), "state": variables["state"]}
    rng = np.random.default_rng(5)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32), jnp.bfloat16)
    a_on = np.asarray(model_on.encode(vb, im, train=False), np.float32)
    a_off = np.asarray(model_off.encode(vb, im, train=False), np.float32)
    scale = max(1e-3, float(np.abs(a_off).max()))
    assert np.max(np.abs(a_on - a_off)) / scale < 0.1
    corr = np.corrcoef(a_on.ravel(), a_off.ravel())[0, 1]
    assert corr > 0.999
