"""Fused stem kernel (kernels/stem.py) vs the unfused jnp oracle.

The kernel replaces normalize -> conv3x3/s2 -> BN -> ReLU -> maxpool3x3/s2
(the reference encoder's entry sequence, reference: model.py:59-62 + the
shufflenet stem) with one Pallas pass.  fp32 must match the oracle to
float tolerance INCLUDING every border (zero conv pad after normalize, pool
edge windows); bf16 within bf16 rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sat_tpu.kernels.stem import (build_stem_patches, fused_stem_pool,
                                  stem_pool_reference, stem_supported)

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _random_stem(rng, f=24, kh=3):
    kernel = jnp.asarray(rng.normal(0, 0.2, (kh, kh, 3, f)), jnp.float32)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    bb = jnp.asarray(rng.normal(0, 0.3, (f,)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.2, (f,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.2, 1.0, (f,)), jnp.float32)
    return kernel, sc, bb, mu, var


@pytest.mark.parametrize("size", [32, 64, 224])
def test_fused_stem_fp32_exact(size):
    rng = np.random.default_rng(0)
    kernel, sc, bb, mu, var = _random_stem(rng)
    x = jnp.asarray(rng.random((2, size, size, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    assert got.shape == (2, size // 4, size // 4, 24)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_bf16_close():
    rng = np.random.default_rng(1)
    kernel, sc, bb, mu, var = _random_stem(rng)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.bfloat16)
    want = stem_pool_reference(x.astype(jnp.float32), kernel, sc, bb, mu,
                               var, 1e-5, MEAN, STD)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.array(got, np.float32), np.array(want),
                               rtol=0.05, atol=0.05)


def test_fused_stem_small_features():
    # F=16 stem (mobilenet-class width) exercises the generic lane math
    rng = np.random.default_rng(2)
    kernel, sc, bb, mu, var = _random_stem(rng, f=16)
    x = jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act,f", [("relu6", 32), ("hswish", 16),
                                   ("relu", 32)])
def test_fused_stem_nopool_acts(act, f):
    # mobilenet_v2 (relu6), mobilenet_v3 (hswish), mnasnet (relu) stems:
    # conv+BN+act with no maxpool
    rng = np.random.default_rng(7)
    kernel, sc, bb, mu, var = _random_stem(rng, f=f)
    x = jnp.asarray(rng.random((2, 48, 48, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                               act=act, pool=False)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                          act=act, pool=False)
    assert got.shape == (2, 24, 24, f)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_patch_builder_layout():
    # row (i, g) = [row 2i-1 | row 2i | row 2i+1], 8 px x 3 ch each
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    p = np.array(build_stem_patches(x))
    xs = np.array(x)[0]
    ch, g = 8, 2
    assert p.shape == (1, ch * g, 72)
    for i in (0, 3, 7):
        for gg in range(g):
            row = p[0, i * g + gg]
            want_mid = xs[2 * i, 8 * gg:8 * gg + 8].reshape(-1)
            np.testing.assert_array_equal(row[24:48], want_mid)
            want_lo = (np.zeros(24, np.float32) if i == 0
                       else xs[2 * i - 1, 8 * gg:8 * gg + 8].reshape(-1))
            np.testing.assert_array_equal(row[:24], want_lo)
            np.testing.assert_array_equal(
                row[48:], xs[2 * i + 1, 8 * gg:8 * gg + 8].reshape(-1))


def test_stem_supported_gates():
    assert stem_supported(224, 24)
    assert stem_supported(160, 24)
    assert not stem_supported(225, 24)    # W % 8 != 0
    assert stem_supported(224, 64)        # falls back to 2-output packing
    assert stem_supported(224, 64, 7)     # resnet/densenet stems
    assert not stem_supported(224, 96, 7)  # densenet161: 2F > 128 lanes
    assert not stem_supported(224, 24, 5)  # unknown kernel size


@pytest.mark.parametrize("f,pool", [(64, True), (64, False)])
def test_fused_stem_7x7(f, pool):
    # resnet/resnext/wide_resnet/densenet stem: 7x7/s2/p3 F=64 (+ maxpool)
    rng = np.random.default_rng(11)
    kernel, sc, bb, mu, var = _random_stem(rng, f=f, kh=7)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                               pool=pool)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                          pool=pool)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_encode_fused_matches_unfused_resnet():
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel

    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="resnet18", input_size=64, encoder_dim=24,
                    vocab_size=v, vocab_stoi=stoi, embed_dim=12,
                    attention_dim=12, decoder_dim=24)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(8).random((2, 64, 64, 3)),
                       jnp.float32)
    base = model.encode(variables, imgs, train=False)
    model.cfg = model.cfg.replace(fused_stem=True)
    fused = model.encode(variables, imgs, train=False)
    np.testing.assert_allclose(np.array(fused), np.array(base),
                               rtol=2e-4, atol=2e-4)


def test_encode_fused_matches_unfused():
    # full integration: SATModel.encode with the fused stem kernel forced on
    # must reproduce the unfused flax path (both fp32 here)
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel

    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(5).random((2, 64, 64, 3)),
                       jnp.float32)
    base = model.encode(variables, imgs, train=False)
    model.cfg = model.cfg.replace(fused_stem=True)
    fused = model.encode(variables, imgs, train=False)
    np.testing.assert_allclose(np.array(fused), np.array(base),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["mobilenet_v3_small", "mobilenet_v2",
                                  "mnasnet0_5"])
def test_encode_fused_matches_unfused_nopool_archs(arch):
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel

    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch=arch, input_size=64, encoder_dim=24,
                    vocab_size=v, vocab_stoi=stoi, embed_dim=12,
                    attention_dim=12, decoder_dim=24)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(6).random((2, 64, 64, 3)),
                       jnp.float32)
    base = model.encode(variables, imgs, train=False)
    model.cfg = model.cfg.replace(fused_stem=True)
    fused = model.encode(variables, imgs, train=False)
    np.testing.assert_allclose(np.array(fused), np.array(base),
                               rtol=2e-4, atol=2e-4)


def test_fused_stem_k3_wide_fallback():
    # 3x3 stem with F=64: 4F > 128 lanes, so the kernel falls back to the
    # 2-outputs-per-block packing — numeric parity for that geometry
    rng = np.random.default_rng(13)
    kernel, sc, bb, mu, var = _random_stem(rng, f=64)
    x = jnp.asarray(rng.random((2, 48, 48, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                               pool=False)
    got = fused_stem_pool(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD,
                          pool=False)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_sharded_matches_reference():
    # shard_map wrapper: the kernel under a multi-device mesh (batch sharded
    # over every axis per parallel/mesh.py data_sharding) must match the
    # unfused oracle exactly in fp32 — and insert zero collectives (the stem
    # is embarrassingly parallel over batch)
    from sat_tpu.kernels.stem import fused_stem_pool_sharded
    from sat_tpu.parallel.mesh import create_mesh, data_sharding

    mesh = create_mesh((4, 2), ("data", "model"))
    rng = np.random.default_rng(11)
    kernel, sc, bb, mu, var = _random_stem(rng)
    x = jnp.asarray(rng.random((16, 64, 64, 3)), jnp.float32)
    want = stem_pool_reference(x, kernel, sc, bb, mu, var, 1e-5, MEAN, STD)
    xs = jax.device_put(x, data_sharding(mesh))
    got = jax.jit(lambda *a: fused_stem_pool_sharded(
        *a, 1e-5, MEAN, STD, mesh=mesh))(xs, kernel, sc, bb, mu, var)
    assert got.sharding.is_equivalent_to(data_sharding(mesh), got.ndim)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_encode_fused_sharded_matches_unfused():
    # model-level: encode with model.mesh registered routes the fused stem
    # through shard_map and reproduces the single-device unfused path
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel
    from sat_tpu.parallel.mesh import (create_mesh, data_sharding,
                                       place_tree)

    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(7).random((8, 64, 64, 3)),
                       jnp.float32)
    base = model.encode(variables, imgs, train=False)

    mesh = create_mesh((8,), ("data",))
    model.mesh = mesh
    model.cfg = model.cfg.replace(fused_stem=True)
    vs = place_tree(variables, mesh)
    xs = jax.device_put(imgs, data_sharding(mesh))
    fused = jax.jit(lambda v_, i_: model.encode(v_, i_, train=False))(vs, xs)
    np.testing.assert_allclose(np.array(fused), np.array(base),
                               rtol=2e-4, atol=2e-4)


def test_encode_fused_sharded_indivisible_batch_falls_back():
    # batch not divisible by the mesh -> the fused path must decline (None)
    # rather than produce a ragged shard_map
    from sat_tpu.config import SATConfig
    from sat_tpu.models.model import SATModel
    from sat_tpu.parallel.mesh import create_mesh

    v = 40
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64,
                    encoder_dim=24, vocab_size=v, vocab_stoi=stoi,
                    embed_dim=12, attention_dim=12, decoder_dim=24)
    model, variables = SATModel.create(cfg, jax.random.PRNGKey(0))
    model.mesh = create_mesh((8,), ("data",))
    model.cfg = model.cfg.replace(fused_stem=True)
    imgs = jnp.asarray(np.random.default_rng(9).random((6, 64, 64, 3)),
                       jnp.float32)
    assert model._fused_stem_out(variables, imgs) is None
