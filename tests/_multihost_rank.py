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
    with open(out_path, "w") as f:
        json.dump({"rank": rank, "loss": float(jax.device_get(loss)),
                   "gsum": gsum}, f)
    print(f"rank{rank} done loss={float(jax.device_get(loss)):.6f}", flush=True)


if __name__ == "__main__":
    main()
