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
import jax.numpy as jnp
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


def fsdp_spec(shape, n_shards: int) -> P:
    """ZeRO-style per-leaf spec: shard the LARGEST axis divisible by the
    mesh size over `data`; leaves with no such axis (scalars, small biases)
    stay replicated.  Ties go to the earliest axis."""
    best_ax, best_size = None, 0
    for ax, size in enumerate(shape):
        if size % n_shards == 0 and size > best_size:
            best_ax, best_size = ax, size
    if best_ax is None:
        return P()
    return P(*([None] * best_ax + ["data"]))


def fsdp_sharding(mesh: Mesh, tree):
    """NamedSharding tree for fully-sharded (ZeRO) parameter/optimizer
    placement over the `data` axis."""
    n = mesh.size
    return jax.tree.map(
        lambda a: NamedSharding(mesh, fsdp_spec(a.shape, n)), tree
    )


def shard_batch(mesh: Mesh, batch):
    """Place a host-side Batch pytree with its batch dim over the data axis.

    The pytree holds each process's LOCAL rows (BucketedLoader loads only
    its contiguous block of the global batch); the global array is
    assembled from the per-process blocks without any cross-host data
    movement — rows stay on the host that loaded them.  Single host:
    local == global and this is a plain device_put."""
    sh = batch_sharding(mesh)
    all_local = all(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    )
    n_proc = 1 if all_local else jax.process_count()

    def place(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * n_proc,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sh, a, global_shape)

    return jax.tree.map(place, batch)


def shard_state(mesh: Mesh, state, fsdp: bool = False):
    """Place train state (params + opt) across the mesh.

    Default (reference DDP semantics, SURVEY.md §2 parallelism table):
    everything replicated.  With ``fsdp=True`` each parameter / optimizer
    leaf is instead SHARDED over `data` on its largest divisible axis
    (ZeRO: per-chip HBM for master params + Adam moments drops ~mesh-size
    fold).  The step functions are unchanged — GSPMD all-gathers params in
    front of the shard_map'd loss and partitions the optimizer update along
    the stored layout; `cfg.fsdp` gates a sharding constraint that keeps the
    updated state sharded across steps."""
    if fsdp:
        n = mesh.size
        return jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, fsdp_spec(jnp.shape(a), n))
            ),
            state,
        )
    rep = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), state)
