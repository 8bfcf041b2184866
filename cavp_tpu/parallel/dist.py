"""Multi-host bootstrap.

Replaces the reference's ``dist.init_process_group("nccl")`` rendezvous
with hardcoded MASTER_ADDR/PORT (``engine/engine.py:50-54``): on TPU
pods, ``jax.distributed.initialize()`` discovers peers from the
environment; on a single host (or under the CPU test mesh) it is a
no-op. Rank gating helpers mirror ``utils/ddp_utils.py:8-18``.
"""

from __future__ import annotations

import os

import jax

# Environment markers of a real multi-worker deployment where
# jax.distributed.initialize() can autodiscover its peers: Cloud TPU
# pod metadata, explicit coordinators, or SLURM/OpenMPI launchers
# (jax.distributed supports all of these cluster environments).
_CLUSTER_ENV_KEYS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
)
# launcher/pod vars that indicate a cluster only when the world size
# they encode is > 1 (e.g. a single-host TPU VM also sets
# TPU_WORKER_HOSTNAMES with one entry)
_SIZED_ENV_KEYS = {
    "TPU_WORKER_HOSTNAMES": lambda v: len(v.split(",")) > 1,
    "SLURM_JOB_NUM_NODES": lambda v: v.strip().isdigit() and int(v) > 1,
    "OMPI_COMM_WORLD_SIZE": lambda v: v.strip().isdigit() and int(v) > 1,
}


def _cluster_detected() -> bool:
    if any(os.environ.get(k) for k in _CLUSTER_ENV_KEYS):
        return True
    for key, pred in _SIZED_ENV_KEYS.items():
        v = os.environ.get(key)
        if v and pred(v):
            return True
    return False


def _already_initialized() -> bool:
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def initialize_distributed(**kwargs) -> None:
    """Initialize the multi-host runtime whenever a cluster environment
    is detectable (Cloud TPU pod metadata, an explicit coordinator
    address, SLURM/MPI launch vars) — the reference's
    ``init_process_group`` equivalent, without its hardcoded rendezvous.

    Safe to call unconditionally: it is a no-op on a plain single host
    (including the CPU test mesh) and when already initialized. Set
    ``CAVP_NO_DISTRIBUTED=1`` to force single-process mode.
    """
    if os.environ.get("CAVP_NO_DISTRIBUTED"):
        return
    # NOTE: no jax.process_count()/jax.devices() here — touching the
    # backend before jax.distributed.initialize() would pin
    # single-process mode.
    if _already_initialized():
        return
    if not (kwargs or _cluster_detected()):
        return
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            import logging

            logging.getLogger("cavp_tpu").warning(
                "cluster environment detected but the XLA backend is "
                "already initialized; continuing single-process (call "
                "initialize_distributed() before any JAX op to fix)")
            return
    except (ImportError, AttributeError):
        # the backends_are_initialized probe is a private jax API and
        # purely advisory — never let its absence crash the bootstrap
        pass
    jax.distributed.initialize(**kwargs)


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """Rank-0 gate (reference ``supress_printer`` / rank-0 wandb)."""
    return jax.process_index() == 0


def barrier() -> None:
    """Cross-host barrier (reference ``ddp_utils.barrier``): a tiny psum
    forces all hosts to synchronize."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("cavp_tpu_barrier")


def allsum_across_processes(tree):
    """Sum a metrics pytree over all processes (the TPU-native
    ``dist.all_gather_object``+merge of ``engine/utils.py:341-374``):
    all-gather the host-local values and reduce on host. No-op on a
    single process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    import numpy as np

    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(lambda x: np.sum(x, axis=0), gathered)
