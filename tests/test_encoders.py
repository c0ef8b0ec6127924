"""Encoder zoo shape tests (reference: dev/dev_encoder.py sweeps shapes/params
per arch; expected channel counts from torchvision's published architectures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models.encoder import SATEncoder, build_encoder, probe_encoder
from sat_tpu.models.backbones import BACKBONES, channel_shuffle

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier

# arch -> (final_dim, grid at 224) from the torchvision reference encoders —
# all 24 supported names (readme.md:99-105)
EXPECTED = {
    "resnet18": (512, 7), "resnet34": (512, 7), "resnet50": (2048, 7),
    "resnet101": (2048, 7), "resnet152": (2048, 7),
    "resnext50_32x4d": (2048, 7), "resnext101_32x8d": (2048, 7),
    "wide_resnet50_2": (2048, 7), "wide_resnet101_2": (2048, 7),
    "squeezenet1_0": (512, 13), "squeezenet1_1": (512, 13),
    "densenet121": (1024, 7), "densenet169": (1664, 7),
    "densenet201": (1920, 7), "densenet161": (2208, 7),
    "shufflenet_v2_x0_5": (1024, 7), "shufflenet_v2_x1_0": (1024, 7),
    "shufflenet_v2_x1_5": (1024, 7), "shufflenet_v2_x2_0": (2048, 7),
    "mobilenet_v2": (1280, 7), "mobilenet_v3_large": (960, 7),
    "mobilenet_v3_small": (576, 7),
    "mnasnet0_5": (1280, 7), "mnasnet0_75": (1280, 7),
    "mnasnet1_0": (1280, 7), "mnasnet1_3": (1280, 7),
}


def test_registry_covers_all_24_reference_archs():
    names = ("resnet18 resnet34 resnet50 resnet101 resnet152 "
             "resnext50_32x4d resnext101_32x8d wide_resnet50_2 wide_resnet101_2 "
             "squeezenet1_0 squeezenet1_1 densenet121 densenet169 densenet201 "
             "densenet161 shufflenet_v2_x0_5 shufflenet_v2_x1_0 "
             "shufflenet_v2_x1_5 shufflenet_v2_x2_0 mobilenet_v2 "
             "mobilenet_v3_large mobilenet_v3_small mnasnet0_5 mnasnet0_75 "
             "mnasnet1_0 mnasnet1_3").split()
    assert set(names) <= set(BACKBONES)


@pytest.mark.parametrize("arch", sorted(EXPECTED))
def test_probe_shapes(arch):
    dim, grid = EXPECTED[arch]
    cfg = SATConfig(encoder_arch=arch, input_size=224)
    final_dim, (h, w) = probe_encoder(cfg)
    assert final_dim == dim, f"{arch}: {final_dim} != {dim}"
    assert (h, w) == (grid, grid), f"{arch}: grid {(h, w)} != {grid}"


def test_encoder_dim_projection_and_size():
    """encoder_dim 1x1 conv + encoder_size pool/upsample (readme.md:117-124)."""
    cfg = SATConfig(encoder_arch="mobilenet_v3_small", input_size=224,
                    encoder_dim=256, encoder_size=14)
    final_dim, (h, w) = probe_encoder(cfg)
    assert final_dim == 256 and (h, w) == (14, 14)  # 7 -> upsample -> 14
    cfg = SATConfig(encoder_arch="squeezenet1_1", input_size=224,
                    encoder_dim=128, encoder_size=7)
    final_dim, (h, w) = probe_encoder(cfg)
    assert final_dim == 128 and (h, w) == (7, 7)    # 13 -> adaptive pool -> 7


def test_small_input_forward_and_flatten_order():
    """Run a real forward at small size; flatten must be row-major over (h, w)."""
    cfg = SATConfig(encoder_arch="shufflenet_v2_x0_5", input_size=64)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    assert cfg.encoder_dim == 1024 and grid == (2, 2)
    x = jnp.ones((2, 64, 64, 3)) * 0.5
    out = module.apply(variables, x)
    assert out.shape == (2, 4, 1024)
    fmap = module.apply(variables, x, flatten=False)
    np.testing.assert_allclose(np.array(out),
                               np.array(fmap).reshape(2, 4, 1024), atol=0)


def test_channel_shuffle_roundtrip():
    x = jnp.arange(2 * 1 * 1 * 8, dtype=jnp.float32).reshape(2, 1, 1, 8)
    y = channel_shuffle(x, 2)
    # shuffle interleaves the two halves: [0..3],[4..7] -> [0,4,1,5,2,6,3,7]
    np.testing.assert_array_equal(np.array(y[0, 0, 0]),
                                  [0, 4, 1, 5, 2, 6, 3, 7])


def test_batch_stats_update_in_train_mode():
    cfg = SATConfig(encoder_arch="mobilenet_v3_small", input_size=32)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    train_mod = module.copy(train=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out, mutated = train_mod.apply(variables, x, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.array(b), np.array(a))
               for b, a in zip(before, after))


def test_folded_stem_matches_normalize_path():
    """FoldedStemConv(conv1 with Normalize folded into the kernel) must equal
    normalize_image -> plain conv1 EXACTLY, including the zero-padded borders
    the position-dependent bias map compensates for (backbones.FoldedStemConv;
    reference Normalize-as-first-layer: model.py:59-62)."""
    from flax import linen as nn
    from sat_tpu.models.backbones import FoldedStemConv
    from sat_tpu.ops.image_ops import normalize_image
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (2, 18, 18, 3), jnp.float32)

    folded = FoldedStemConv(24, mean, std)
    vars_f = folded.init(jax.random.PRNGKey(5), x)
    plain = nn.Conv(24, (3, 3), (2, 2), padding=1, use_bias=False)
    vars_p = {"params": {"kernel": vars_f["params"]["kernel"]}}  # same kernel

    got = folded.apply(vars_f, x)
    want = plain.apply(vars_p, normalize_image(x, mean, std))
    assert got.shape == want.shape == (2, 9, 9, 24)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("arch", ["shufflenet_v2_x0_5", "mobilenet_v3_small",
                                  "mobilenet_v2", "mnasnet0_5", "resnet18",
                                  "squeezenet1_0", "squeezenet1_1",
                                  "densenet121"])
def test_encoder_fold_is_transparent(arch):
    """Every FOLD_NORM_ARCHS encoder (normalize folded into the stem kernel)
    must reproduce the explicit normalize->backbone composition on the same
    parameters."""
    from sat_tpu.models.backbones import BACKBONES, FOLD_NORM_ARCHS
    from sat_tpu.ops.image_ops import normalize_image
    assert arch in FOLD_NORM_ARCHS
    cfg = SATConfig(encoder_arch=arch, input_size=32)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    out = module.apply(variables, x, flatten=False)

    # manual composition: explicit normalize + fold_norm=None backbone
    ref_bk = BACKBONES[arch](train=False)
    bk_vars = {"params": variables["params"]["backbone"]}
    if "batch_stats" in variables:  # squeezenet has no BatchNorm
        bk_vars["batch_stats"] = variables["batch_stats"]["backbone"]
    want = ref_bk.apply(bk_vars, normalize_image(x, cfg.mean, cfg.std))
    np.testing.assert_allclose(np.array(out), np.array(want),
                               atol=3e-5, rtol=1e-5)
