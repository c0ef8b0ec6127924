"""Weight-importer tests.

torchvision isn't installed (zero egress), so we synthesize state_dicts with
torchvision's exact key layout — written out independently here for three
families as a double-entry check against the converter — and verify every
backbone leaf gets imported with correct transposition and the encoder runs."""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sat_tpu.config import SATConfig
from sat_tpu.models.encoder import build_encoder
from sat_tpu.models import torch_import as TI


def flax_leaves(tree, prefix=""):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from flax_leaves(v, prefix + k + "/")
        else:
            yield prefix + k, v


def torchvision_keys(arch):
    """(torch_key, flax_param_path_or_None-for-stats) pairs, written from
    torchvision's published state_dict layouts."""
    pairs = []

    def conv(tk, fp):
        pairs.append((f"{tk}.weight", f"{fp}/kernel"))

    def bn(tk, fp):
        pairs.append((f"{tk}.weight", f"{fp}/scale"))
        pairs.append((f"{tk}.bias", f"{fp}/bias"))
        pairs.append((f"{tk}.running_mean", f"stats:{fp}/mean"))
        pairs.append((f"{tk}.running_var", f"stats:{fp}/var"))

    if arch == "resnet18":
        conv("conv1", "conv1")
        bn("bn1", "bn1")
        for i in range(1, 5):
            for j in range(2):
                tp, fp = f"layer{i}.{j}", f"layer{i}_{j}"
                conv(f"{tp}.conv1", f"{fp}/conv1")
                bn(f"{tp}.bn1", f"{fp}/bn1")
                conv(f"{tp}.conv2", f"{fp}/conv2")
                bn(f"{tp}.bn2", f"{fp}/bn2")
                if i > 1 and j == 0:
                    conv(f"{tp}.downsample.0", f"{fp}/down_conv")
                    bn(f"{tp}.downsample.1", f"{fp}/down_bn")
    elif arch == "shufflenet_v2_x0_5":
        conv("conv1.0", "conv1")
        bn("conv1.1", "bn1")
        for s, reps in zip((2, 3, 4), (4, 8, 4)):
            for j in range(reps):
                tp, fp = f"stage{s}.{j}", f"stage{s}_{j}"
                if j == 0:
                    conv(f"{tp}.branch1.0", f"{fp}/b1_dw")
                    bn(f"{tp}.branch1.1", f"{fp}/b1_dwbn")
                    conv(f"{tp}.branch1.2", f"{fp}/b1_pw")
                    bn(f"{tp}.branch1.3", f"{fp}/b1_pwbn")
                conv(f"{tp}.branch2.0", f"{fp}/b2_pw1")
                bn(f"{tp}.branch2.1", f"{fp}/b2_pw1bn")
                conv(f"{tp}.branch2.3", f"{fp}/b2_dw")
                bn(f"{tp}.branch2.4", f"{fp}/b2_dwbn")
                conv(f"{tp}.branch2.5", f"{fp}/b2_pw2")
                bn(f"{tp}.branch2.6", f"{fp}/b2_pw2bn")
        conv("conv5.0", "conv5")
        bn("conv5.1", "bn5")
    elif arch == "mobilenet_v2":
        conv("features.0.0", "stem")
        bn("features.0.1", "stem_bn")
        # features.1: t=1 block (no expand)
        conv("features.1.conv.0.0", "block0/dw")
        bn("features.1.conv.0.1", "block0/dw_bn")
        conv("features.1.conv.1", "block0/project")
        bn("features.1.conv.2", "block0/project_bn")
        for feat in range(2, 18):
            fp = f"block{feat-1}"
            tp = f"features.{feat}.conv"
            conv(f"{tp}.0.0", f"{fp}/expand")
            bn(f"{tp}.0.1", f"{fp}/expand_bn")
            conv(f"{tp}.1.0", f"{fp}/dw")
            bn(f"{tp}.1.1", f"{fp}/dw_bn")
            conv(f"{tp}.2", f"{fp}/project")
            bn(f"{tp}.3", f"{fp}/project_bn")
        conv("features.18.0", "head")
        bn("features.18.1", "head_bn")
    else:
        raise ValueError(arch)
    return pairs


@pytest.mark.parametrize("arch", ["resnet18", "shufflenet_v2_x0_5",
                                  "mobilenet_v2"])
def test_import_fills_every_backbone_leaf(arch):
    cfg = SATConfig(encoder_arch=arch, input_size=64)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    host_vars = jax.device_get(variables)
    flax_params = host_vars["params"]["backbone"]
    flax_stats = host_vars["batch_stats"]["backbone"]

    def find(tree, name):
        node = tree
        for p in name.split("/"):
            node = node[p]
        return node

    rng = np.random.default_rng(1)
    sd = {}
    for tkey, fname in torchvision_keys(arch):
        if fname.startswith("stats:"):
            fshape = find(flax_stats, fname[6:]).shape
            sd[tkey] = rng.normal(size=fshape).astype(np.float32)
        else:
            fshape = find(flax_params, fname).shape
            if fname.endswith("kernel"):
                sd[tkey] = rng.normal(size=(fshape[3], fshape[2], fshape[0],
                                            fshape[1])).astype(np.float32)
            else:
                sd[tkey] = rng.normal(size=fshape).astype(np.float32)

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **sd)
        full_vars = {"params": {"encoder": host_vars["params"]},
                     "state": {"batch_stats": host_vars["batch_stats"]}}
        out = TI.import_pretrained(arch, f.name, full_vars)

    before = dict(flax_leaves(flax_params))
    after = dict(flax_leaves(out["params"]["encoder"]["backbone"]))
    changed = [k for k in before if not np.allclose(before[k], after[k])]
    assert len(changed) == len(before), \
        f"{arch}: only {len(changed)}/{len(before)} param leaves imported"
    sbefore = dict(flax_leaves(flax_stats))
    safter = dict(flax_leaves(out["state"]["batch_stats"]["backbone"]))
    schanged = [k for k in sbefore if not np.allclose(sbefore[k], safter[k])]
    assert len(schanged) == len(sbefore)

    # the imported encoder still runs with consistent shapes
    new_vars = jax.tree_util.tree_map(jnp.asarray, {
        "params": out["params"]["encoder"],
        "batch_stats": out["state"]["batch_stats"]})
    y = module.apply(new_vars, jnp.ones((1, 64, 64, 3)) * 0.5)
    assert y.ndim == 3


def test_squeezenet_import_without_batchnorm():
    """squeezenet has no BN -> empty batch_stats tree must not crash import
    (regression: KeyError 'encoder' on the stats merge)."""
    arch = "squeezenet1_1"
    cfg = SATConfig(encoder_arch=arch, input_size=64)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    host_vars = jax.device_get(variables)
    flax_params = host_vars["params"]["backbone"]

    # torchvision squeezenet1_1 feature indices with fire modules
    rng = np.random.default_rng(0)
    sd = {}

    def conv_keys(tk, fp):
        fshape = flax_params
        for p in fp.split("/"):
            fshape = fshape[p]
        k = fshape["kernel"].shape
        sd[f"{tk}.weight"] = rng.normal(size=(k[3], k[2], k[0], k[1])).astype(np.float32)
        sd[f"{tk}.bias"] = rng.normal(size=fshape["bias"].shape).astype(np.float32)

    conv_keys("features.0", "conv1")
    for n, feat in zip(range(2, 10), (3, 4, 6, 7, 9, 10, 11, 12)):
        for part in ("squeeze", "expand1x1", "expand3x3"):
            conv_keys(f"features.{feat}.{part}", f"fire{n}/{part}")

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **sd)
        full_vars = {"params": {"encoder": host_vars["params"]},
                     "state": {"batch_stats": {}}}  # no BN stats at all
        out = TI.import_pretrained(arch, f.name, full_vars)
    before = dict(flax_leaves(flax_params))
    after = dict(flax_leaves(out["params"]["encoder"]["backbone"]))
    assert all(not np.allclose(before[k], after[k]) for k in before)


def test_pretrained_weights_through_model_create(tmp_path):
    """The --pretrained_weights path through SATModel.create (regression: the
    stats merge expected a layout SATModel.create never produces)."""
    from sat_tpu.models.model import SATModel
    arch = "shufflenet_v2_x0_5"
    cfg = SATConfig(encoder_arch=arch, input_size=64)
    module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
    host_vars = jax.device_get(variables)

    def find(tree, name):
        for p in name.split("/"):
            tree = tree[p]
        return tree

    rng = np.random.default_rng(3)
    sd = {}
    for tkey, fname in torchvision_keys(arch):
        if fname.startswith("stats:"):
            shape = find(host_vars["batch_stats"]["backbone"], fname[6:]).shape
            sd[tkey] = rng.normal(size=shape).astype(np.float32)
        else:
            k = find(host_vars["params"]["backbone"], fname).shape
            if fname.endswith("kernel"):
                sd[tkey] = rng.normal(size=(k[3], k[2], k[0], k[1])).astype(np.float32)
            else:
                sd[tkey] = rng.normal(size=k).astype(np.float32)
    wpath = str(tmp_path / "w.npz")
    np.savez(wpath, **sd)

    v = 20
    stoi = {f"w{i}": i for i in range(1, v - 3)}
    stoi.update({"<UNK>": v - 3, "<START>": v - 2, "<END>": v - 1, "<PAD>": 0})
    mcfg = SATConfig(encoder_arch=arch, input_size=64, vocab_size=v,
                     vocab_stoi=stoi, embed_dim=8, attention_dim=8,
                     decoder_dim=16, pretrained=True, pretrained_weights=wpath)
    model, mvars = SATModel.create(mcfg, jax.random.PRNGKey(1))
    got = np.asarray(jax.device_get(
        mvars["params"]["encoder"]["backbone"]["conv1"]["kernel"]))
    want = sd["conv1.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv_transpose_orientation():
    """A 1x1 conv with a known torch weight must act as the same linear map
    after conversion (catches transposition mistakes)."""
    w_torch = np.zeros((3, 2, 1, 1), np.float32)  # (O=3, I=2, 1, 1)
    w_torch[0, 1] = 5.0  # out0 = 5 * in1
    k = TI._conv(w_torch)
    assert k.shape == (1, 1, 2, 3)
    x = np.array([[[[1.0, 2.0]]]], np.float32)  # NHWC
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.array(y)[0, 0, 0], [10.0, 0.0, 0.0])
