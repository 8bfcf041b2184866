"""Device mesh + sharding constructors.

The TPU-native replacement for the reference's DDP machinery
(``engine/engine.py:50-54`` NCCL init, ``utils/ddp_utils.py``,
``DistributedSampler`` — SURVEY.md §2.9): a 1-D ``data`` mesh over all
devices; batches are sharded on their leading axis, parameters are
replicated, and every collective (gradient allreduce, SyncBN statistics,
eval-metric merging) is emitted by XLA from the sharding annotations —
there is no hand-written communication code to keep correct.

Cross-replica BatchNorm falls out for free: under jit with a
batch-sharded input, a BatchNorm reduction over the batch axis *is* the
global-batch statistic (XLA inserts the psum), which is exactly
``SyncBatchNorm.convert_sync_batchnorm`` semantics.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def create_mesh(num_devices: Optional[int] = None,
                devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh (reference: one process per GPU + NCCL pg)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def create_hybrid_mesh(num_slices: Optional[int] = None,
                       devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D ``(dcn, ici)`` data-parallel mesh for multi-slice TPU pods.

    The reference's only cross-node notion is ``--nodes`` multiplying the
    DDP world size over one flat NCCL group (``main_avss.py:216``,
    ``engine/engine.py:50-54``). On TPU the fabric is hierarchical: ICI
    within a slice (fast), DCN between slices (slow). Expressing that
    hierarchy as a 2-D mesh — outer axis ``dcn`` ordered by
    ``device.slice_index``, inner axis ``ici`` — lets XLA emit
    hierarchical collectives: the gradient allreduce reduce-scatters over
    ICI first and only the per-slice partials cross DCN.

    Devices are grouped by ``slice_index`` when present (real multi-slice
    hardware); otherwise the flat device list is split into
    ``num_slices`` equal groups (CPU/virtual-device testing). Batch
    sharding and parameter replication work unchanged because
    :func:`batch_sharding` shards the leading axis over *all* mesh axes.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    have_slices = (all(s is not None for s in slice_ids)
                   and len(set(slice_ids)) > 1)
    if have_slices:
        # real multi-slice hardware: group strictly by slice_index — a
        # plain reshape could put devices of different slices in one
        # "ici" row, silently sending intra-slice collectives over DCN
        groups: dict = {}
        for d, s in zip(devices, slice_ids):
            groups.setdefault(s, []).append(d)
        if num_slices is not None and len(groups) != num_slices:
            raise ValueError(
                f"devices span {len(groups)} slices, requested {num_slices}")
        if len({len(g) for g in groups.values()}) != 1:
            raise ValueError(
                "uneven devices per slice: "
                f"{ {k: len(g) for k, g in groups.items()} } — pass a "
                "device subset with equal per-slice counts")
        arr = np.asarray([groups[k] for k in sorted(groups)])
        return Mesh(arr, (DCN_AXIS, ICI_AXIS))
    # no (or single) slice metadata: split the flat list (CPU/virtual
    # testing, or --nodes used as a plain world-size multiplier)
    num_slices = num_slices or 1
    if len(devices) % num_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {num_slices} slices")
    arr = np.asarray(devices).reshape(num_slices, -1)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def local_mesh() -> Mesh:
    """Mesh over this process's addressable devices only. Used for
    evaluation under multi-host: each process evaluates its own disjoint
    shard with NO cross-process lockstep (unequal shard sizes are fine),
    and the metric sums merge once at the end — torch's
    DistributedSampler-padding problem never arises."""
    return Mesh(np.asarray(jax.local_devices()), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across every mesh axis jointly —
    P(("data",)) on the 1-D mesh, P(("dcn", "ici")) on a hybrid mesh."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(x, sharding: NamedSharding):
    """Fully-addressable mesh (single host, or a process-local mesh):
    plain device_put. Mesh spanning processes: the host array is this
    process's *local* shard, so assemble the global array from the
    per-process pieces (device_put would wrongly treat it as global)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with its leading axis sharded over data.
    Under multi-host, each process contributes its local shard of the
    global batch (the per-process loader shards handle disjointness)."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _place(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _place(x, sharding), tree)


def localize_replicated(tree):
    """Rebuild fully-replicated (possibly global-mesh) arrays as
    local-mesh replicated arrays, without host round-trips: each process
    already holds a complete replica on its own devices."""
    sharding = replicated(local_mesh())

    def conv(x):
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable:
            x = x.addressable_data(0)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(conv, tree)


