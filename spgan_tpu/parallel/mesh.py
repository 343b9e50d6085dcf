"""SPMD device-mesh utilities.

The reference's parallelism is single-node nn.DataParallel (train.py:809-814).
The TPU-native story is one SPMD program: a 1-D `data` mesh over ICI (extend
to ('data','fsdp') if the model ever outgrows a chip — at ~30-80M params it
does not), batch sharded, parameters replicated, gradient all-reduce inserted
by XLA from the sharding annotations.  Multi-host runs reuse the same program
over DCN via jax.distributed.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data",
                dim: int = 0) -> Any:
    """Shard the batch dim (index `dim`) of every array leaf across the mesh.
    axis=None replicates."""
    def put(x):
        if axis is not None and hasattr(x, "ndim") and x.ndim > dim:
            spec = P(*([None] * dim), axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
