"""Space-to-depth packed stem (models/packed_stem.py): exactness vs the
standard flax stem path, support gating, and full-model wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sat_tpu.config import SATConfig
from sat_tpu.models.model import SATModel
from sat_tpu.models.packed_stem import (pack_stem_kernel, packed_stem_pool,
                                        packed_stem_supported)


def _model(packed, input_size=64):
    stoi = {"<PAD>": 0, "<UNK>": 1, "<START>": 2, "<END>": 3,
            **{f"w{i}": i for i in range(4, 32)}}
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=input_size,
                    vocab_size=32, vocab_stoi=stoi, embed_dim=16,
                    attention_dim=16, decoder_dim=32, encoder_dim=24,
                    packed_stem=packed)
    return SATModel.create(cfg, jax.random.PRNGKey(0))


def test_packed_stem_function_matches_unfused():
    """Pure-function parity: [fold-norm] conv3x3s2p1 + BN + relu +
    maxpool3x3s2p1 vs the packed 5x5/s4 + 9-slice-max formulation."""
    from flax import linen as nn
    from sat_tpu.models.backbones import FoldedStemConv

    rng = np.random.default_rng(0)
    for h in (32, 64, 96):
        x = jnp.asarray(rng.random((2, h, h, 3), np.float32))
        kernel = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 24)), jnp.float32)
        scale = jnp.asarray(rng.random(24) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, 24), jnp.float32)
        mean_s = jnp.asarray(rng.normal(0, 0.1, 24), jnp.float32)
        var_s = jnp.asarray(rng.random(24) + 0.2, jnp.float32)
        nm, ns = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        y = FoldedStemConv(24, nm, ns).apply({"params": {"kernel": kernel}}, x)
        y = (y - mean_s) * jax.lax.rsqrt(var_s + 1e-5) * scale + bias
        ref = nn.max_pool(nn.relu(y), (3, 3), (2, 2),
                          padding=((1, 1), (1, 1)))
        got = packed_stem_pool(x, kernel, scale, bias, mean_s, var_s, 1e-5,
                               nm, ns)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-6, rtol=1e-5)


def test_packed_kernel_scatter_layout():
    """Packed channel (2p+q)*C + o must read the original 3x3 taps at offsets
    (2p+di, 2q+dj)."""
    k = jnp.arange(3 * 3 * 3 * 4, dtype=jnp.float32).reshape(3, 3, 3, 4)
    w5 = pack_stem_kernel(k)
    assert w5.shape == (5, 5, 3, 16)
    for p in (0, 1):
        for q in (0, 1):
            blk = (2 * p + q) * 4
            np.testing.assert_array_equal(
                np.asarray(w5[2 * p:2 * p + 3, 2 * q:2 * q + 3, :,
                              blk:blk + 4]), np.asarray(k))
    # everything else is zero
    total = float(jnp.abs(w5).sum())
    assert abs(total - 4 * float(jnp.abs(k).sum())) < 1e-4


def test_support_gating():
    k3 = jnp.zeros((3, 3, 3, 24))
    assert packed_stem_supported(224, 224, k3)
    assert packed_stem_supported(64, 64, k3)
    assert not packed_stem_supported(66, 66, k3)     # not % 4
    assert not packed_stem_supported(64, 32, k3)     # non-square
    assert not packed_stem_supported(224, 224, jnp.zeros((7, 7, 3, 64)))


def test_model_encode_matches_with_and_without_packed_stem():
    """Full encode parity: auto/on vs forced-off must agree (fp32 summation
    order aside) — the packed stem is a scheduling choice, not a numerics
    one."""
    model_on, variables = _model(packed=True)
    model_off, _ = _model(packed=False)
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    a_on = model_on.encode(variables, im, train=False)
    a_off = model_off.encode(variables, im, train=False)
    np.testing.assert_allclose(np.asarray(a_on), np.asarray(a_off),
                               atol=2e-5, rtol=1e-4)
    # auto (None) stays OFF — the real-chip A/B went to the plain XLA stem
    # (EXPERIMENTS.md "packed stem verdict")
    model_auto, _ = _model(packed=None)
    a_auto = model_auto.encode(variables, im, train=False)
    np.testing.assert_array_equal(np.asarray(a_auto), np.asarray(a_off))


def test_train_path_unaffected():
    """Train mode keeps the standard flax stem (BN batch stats live there):
    packed on/off must be bit-identical in train mode."""
    model_on, variables = _model(packed=True)
    model_off, _ = _model(packed=False)
    rng = np.random.default_rng(2)
    im = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    a_on, bs_on = model_on.encode(variables, im, train=True)
    a_off, bs_off = model_off.encode(variables, im, train=True)
    np.testing.assert_array_equal(np.asarray(a_on), np.asarray(a_off))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bs_on, bs_off)
