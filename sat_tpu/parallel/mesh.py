"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's pass-through `--gpus` flag (reference: train.py:27-28, 272;
SURVEY.md §2.6).

Data parallelism is expressed as jax.sharding over a 1-D "data" mesh axis:
batches shard on axis 0, params/opt-state replicate, and the gradient
all-reduce is the XLA collective pjit inserts over ICI.  Multi-host extends the
same mesh over DCN via jax.distributed.initialize (no NCCL analogue needed)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host mesh over DCN: call once per process before creating the
    mesh (SURVEY.md §2.6 — the reference has no distributed backend at all;
    this is the jax.distributed replacement for what NCCL/DDP would be).

    No-ops unless the standard coordinator env vars are present
    (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES/JAX_PROCESS_ID] or a TPU-pod
    metadata environment). Returns True when distributed init ran."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def create_mesh(mesh_shape: Sequence[int] = (-1,),
                axis_names: Sequence[str] = ("data",),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: shard axis 0 over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Host numpy batch -> device arrays sharded on the data axis."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
