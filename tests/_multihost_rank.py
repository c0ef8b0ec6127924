"""Rank worker for tests/test_multihost.py.

Simulates one HOST of a 2-host DCN deployment: 4 virtual CPU devices per
process, jax.distributed over localhost with gloo CPU collectives.  Runs one
data-parallel train step on this process's rows of the shared global batch
(test_parallel.make_setup is deterministic, so both ranks — and the
single-process pytest run — build identical params and data) and writes
loss + a gradient fingerprint as JSON for the parent test to compare."""

import json
import os
import sys


def main():
    rank, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(rank)
    os.environ["JAX_CPU_COLLECTIVES"] = "gloo"
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sat_tpu.parallel.mesh import (create_mesh, maybe_initialize_distributed,
                                       replicate_tree, shard_batch)
    assert maybe_initialize_distributed(), "env-driven distributed init"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    from test_parallel import make_setup
    cfg, variables, train_step, batch, model = make_setup()

    n_local = batch["images"].shape[0] // 2
    local = {k: v[rank * n_local:(rank + 1) * n_local] for k, v in batch.items()}

    mesh = create_mesh((8,), ("data",), jax.devices())
    variables = replicate_tree(variables, mesh)
    dbatch = shard_batch(local, mesh)  # assembles the global batch over DCN
    grads, loss = jax.jit(train_step)(variables, dbatch, jax.random.PRNGKey(7))

    gsum = float(sum(np.abs(np.asarray(jax.device_get(g))).sum()
                     for g in jax.tree_util.tree_leaves(grads)))

    # ---- vocab-TP across hosts: (4, 2) data x model over the 2 processes.
    # The embedding/out_proj shards span BOTH processes; the same train step
    # must agree with DP, and fetch_global must reassemble a cross-host
    # sharded table bit-exactly (this is the checkpoint-gather path).
    from sat_tpu.parallel.mesh import fetch_global, place_tree
    host_vars = jax.device_get(variables)  # replicated -> local copy
    mesh_tp = create_mesh((4, 2), ("data", "model"), jax.devices())
    vars_tp = place_tree(host_vars, mesh_tp)
    emb_tp = vars_tp["params"]["decoder"]["embedding"]
    assert not emb_tp.is_fully_addressable, "expected a cross-host shard"
    dbatch_tp = shard_batch(local, mesh_tp)
    grads_tp, loss_tp = jax.jit(train_step)(vars_tp, dbatch_tp,
                                            jax.random.PRNGKey(7))
    gsum_tp = float(sum(np.abs(np.asarray(fetch_global(g))).sum()
                        for g in jax.tree_util.tree_leaves(grads_tp)))
    emb_back = np.asarray(fetch_global(emb_tp))
    assert np.array_equal(
        emb_back, np.asarray(host_vars["params"]["decoder"]["embedding"])), \
        "fetch_global did not reassemble the sharded embedding bit-exactly"

    # ---- vocab-TP with the MODEL axis spanning hosts: mesh (1, 8) puts the
    # embedding/out_proj row/column shards across BOTH processes.  Regression
    # for the place_tree global_shape fix (ADVICE r1, medium): each process
    # passes the FULL table to make_array_from_process_local_data; without an
    # explicit global_shape the inferred global is inflated by the process
    # count and the tables mis-assemble (the (4,2) phase above can't see it —
    # its model shards are process-local).
    mesh_xh = create_mesh((1, 8), ("data", "model"), jax.devices())
    vars_xh = place_tree(host_vars, mesh_xh)
    emb_xh = vars_xh["params"]["decoder"]["embedding"]
    assert emb_xh.shape == host_vars["params"]["decoder"]["embedding"].shape, \
        f"global shape inflated: {emb_xh.shape}"
    assert not emb_xh.is_fully_addressable
    dbatch_xh = shard_batch(local, mesh_xh)
    grads_xh, loss_xh = jax.jit(train_step)(vars_xh, dbatch_xh,
                                            jax.random.PRNGKey(7))
    gsum_xh = float(sum(np.abs(np.asarray(fetch_global(g))).sum()
                        for g in jax.tree_util.tree_leaves(grads_xh)))
    emb_back_xh = np.asarray(fetch_global(emb_xh))
    assert np.array_equal(
        emb_back_xh, np.asarray(host_vars["params"]["decoder"]["embedding"])), \
        "cross-host model-axis shard did not reassemble bit-exactly"

    with open(out_path, "w") as f:
        json.dump({"rank": rank, "loss": float(jax.device_get(loss)),
                   "gsum": gsum,
                   "loss_tp": float(jax.device_get(loss_tp)),
                   "gsum_tp": gsum_tp,
                   "loss_xh": float(jax.device_get(loss_xh)),
                   "gsum_xh": gsum_xh}, f)
    print(f"rank{rank} done loss={float(jax.device_get(loss)):.6f}", flush=True)


if __name__ == "__main__":
    main()
