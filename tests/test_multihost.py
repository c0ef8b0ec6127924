"""Multi-host (DCN) support: per-process data loading + global batch assembly.

The reference has no distributed story at all (SURVEY §2.6: `--gpus` is a
pass-through).  SAT-TPU's multi-host contract: every process runs the same
program; CaptionLoader(process_index, process_count) yields only this host's
rows of each global batch; mesh.shard_batch assembles the global jax.Array via
make_array_from_process_local_data; gradients all-reduce across hosts.

The 2-process test actually spawns two jax processes connected over localhost
(gloo CPU collectives) — the CPU-testable stand-in for a v5e pod's DCN."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from sat_tpu.data.dataset import CaptionDataset, CaptionLoader
from sat_tpu.data.preprocess import make_synthetic_dataset

pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    path = make_synthetic_dataset(str(tmp_path_factory.mktemp("mhds")),
                                  n_train=16, n_val=8, n_test=4, image_size=32)
    return CaptionDataset(path, "train")


def _collect(loader):
    return list(iter(loader))


def test_loader_process_shards_reassemble(ds):
    """Two process-sharded loaders concatenate exactly to the global loader's
    batches (same epoch order, same global caption trim)."""
    kw = dict(batch_size=8, input_size=32, shuffle=True, seed=3, workers=0,
              train=False, drop_last=True, trim_captions=True,
              native_decode=None)
    full = _collect(CaptionLoader(ds, **kw))
    p0 = _collect(CaptionLoader(ds, process_index=0, process_count=2, **kw))
    p1 = _collect(CaptionLoader(ds, process_index=1, process_count=2, **kw))
    assert len(full) == len(p0) == len(p1) == 2
    for f, a, b in zip(full, p0, p1):
        for k in ("images", "captions", "lengths"):
            merged = np.concatenate([a[k], b[k]], axis=0)
            np.testing.assert_array_equal(merged, f[k], err_msg=k)


def test_loader_rejects_bad_process_config(ds):
    with pytest.raises(AssertionError):
        CaptionLoader(ds, batch_size=9, input_size=32, process_index=0,
                      process_count=2)
    with pytest.raises(AssertionError):
        CaptionLoader(ds, batch_size=8, input_size=32, drop_last=False,
                      process_index=0, process_count=2)


def test_two_process_dcn_matches_single_process(tmp_path):
    """Spawn 2 real jax processes (4 virtual devices each, gloo over
    localhost): the DP train step on the assembled global batch must match the
    single-process 8-device result computed in this pytest process."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = os.path.join(HERE, "_multihost_rank.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # the rank script forces cpu itself
    outs = [str(tmp_path / f"rank{r}.json") for r in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, script, str(r), str(port), outs[r]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in (0, 1)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.load(open(o)) for o in outs]
    # both ranks computed the same global step
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
    assert abs(results[0]["gsum"] - results[1]["gsum"]) < 1e-4 * (
        1 + results[0]["gsum"])
    # the cross-host vocab-TP phase agrees with DP (and its in-script
    # fetch_global reassembly assert passed, or the rank would have died)
    for r in results:
        assert abs(r["loss_tp"] - r["loss"]) < 1e-5
        assert abs(r["gsum_tp"] - r["gsum"]) < 5e-4 * (1 + r["gsum"])
        # model axis ACROSS hosts (mesh (1,8)): the place_tree global_shape
        # regression (ADVICE r1 medium) — in-script asserts checked the
        # table shapes and bit-exact reassembly; here the step must agree
        assert abs(r["loss_xh"] - r["loss"]) < 1e-5
        assert abs(r["gsum_xh"] - r["gsum"]) < 5e-4 * (1 + r["gsum"])

    # reference: the same step single-process on this pytest's 8 CPU devices
    sys.path.insert(0, HERE)
    from test_parallel import make_setup
    from sat_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
    cfg, variables, train_step, batch, _ = make_setup()
    mesh = create_mesh((8,), ("data",), jax.devices())
    grads, loss = jax.jit(train_step)(
        replicate_tree(jax.device_get(variables), mesh),
        shard_batch(batch, mesh), jax.random.PRNGKey(7))
    gsum = float(sum(np.abs(np.asarray(jax.device_get(g))).sum()
                     for g in jax.tree_util.tree_leaves(grads)))
    assert abs(results[0]["loss"] - float(loss)) < 1e-5, logs[0]
    assert abs(results[0]["gsum"] - gsum) < 5e-4 * (1 + gsum)


def test_two_process_trainer_fit(tmp_path):
    """The REAL Trainer.fit() across 2 jax processes: process-sharded
    loaders, allgathered beam validation + scoring, logdir broadcast, and
    exactly ONE writer process producing checkpoints."""
    path = make_synthetic_dataset(str(tmp_path / "ds"), n_train=16, n_val=8,
                                  n_test=4, image_size=32)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = os.path.join(HERE, "_multihost_trainer_rank.py")
    log_root = str(tmp_path / "logs")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    outs = [str(tmp_path / f"trank{r}.json") for r in (0, 1)]
    # log to FILES, not pipes: reading two collective-coupled ranks'
    # pipes sequentially can deadlock once one fills its OS buffer
    logfiles = [str(tmp_path / f"trank{r}.log") for r in (0, 1)]
    handles = [open(lf, "wb") for lf in logfiles]
    procs = [subprocess.Popen(
        [sys.executable, script, str(r), str(port), outs[r], path, log_root],
        env=env, stdout=handles[r], stderr=subprocess.STDOUT)
        for r in (0, 1)]
    for p in procs:
        p.wait(timeout=900)
    for h in handles:
        h.close()
    logs = [open(lf, errors="replace").read() for lf in logfiles]
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.load(open(o)) for o in outs]
    r0 = next(r for r in results if r["rank"] == 0)
    r1 = next(r for r in results if r["rank"] == 1)
    # both ranks agreed on the broadcast logdir and computed the same metrics
    assert r0["logdir"] == r1["logdir"], (r0, r1)
    assert r0["is_main"] and not r1["is_main"]
    for k, v in r0["metrics"].items():
        assert abs(v - r1["metrics"][k]) < 1e-6, (k, r0, r1)
    assert np.isfinite(r0["metrics"]["bleu4"])
    # exactly one version dir; checkpoints written by the single writer
    vdirs = [d for d in os.listdir(os.path.join(log_root, "default"))
             if d.startswith("version_")]
    assert vdirs == ["version_0"], vdirs
    files = os.listdir(r0["logdir"])
    assert "last.ckpt" in files, files
    assert any(f.startswith("epoch=") for f in files), files


def test_shuffle_immune_to_extra_aug_draws(ds):
    """The epoch permutation must come from a dedicated rng stream: extra
    augmentation draws on one host (e.g. a PIL-fallback crop for one corrupt
    image) must not change the NEXT epoch's order (review finding: hosts
    desynchronized after unequal draw counts)."""
    kw = dict(batch_size=8, input_size=32, shuffle=True, seed=5, workers=0,
              train=True, drop_last=True, native_decode=None)
    a = CaptionLoader(ds, **kw)
    b = CaptionLoader(ds, **kw)
    _collect(a)
    a._rng.random(13)  # simulate 13 extra augmentation draws on loader a
    _collect(b)
    ba2, bb2 = _collect(a), _collect(b)
    for x, y in zip(ba2, bb2):
        np.testing.assert_array_equal(x["captions"], y["captions"])
        np.testing.assert_array_equal(x["lengths"], y["lengths"])
