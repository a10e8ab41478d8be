"""Device mesh + sharding layout.

Replaces the reference's Lightning DDP / NCCL runtime (train.py:132-143,
SURVEY.md §2 "Distributed communication backend") with the JAX SPMD model:
a 1-D `data` mesh over all chips (ICI within a slice, DCN across hosts via
`jax.distributed`), batches sharded along `data`, parameters replicated.
Gradient all-reduce and metric reduction are inserted by XLA GSPMD from the
sharding annotations — no explicit collectives needed at this model scale
(~tens of M params; a `model` axis can be added to the mesh later without
touching the step functions)."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None) -> None:
    """Multi-host bring-up (replaces torch.distributed/NCCL init).

    No-op on a single host; on a pod slice call once per process before any
    JAX computation."""
    if coordinator or int(jax.process_count()) > 1:
        jax.distributed.initialize(coordinator_address=coordinator)


def create_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over `data`, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side Batch pytree with its batch dim over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def shard_state(mesh: Mesh, state):
    """Replicate train state (params + opt) across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), state)
