"""Multi-host bootstrap.

Replaces the reference's ``dist.init_process_group("nccl")`` rendezvous
with hardcoded MASTER_ADDR/PORT (``engine/engine.py:50-54``): on TPU
pods, ``jax.distributed.initialize()`` discovers peers from the
environment; on a single host (or under the CPU test mesh) it is a
no-op. Rank gating helpers mirror ``utils/ddp_utils.py:8-18``.
"""

from __future__ import annotations

import jax


def initialize_distributed() -> None:
    """Initialize the multi-host runtime when running on >1 process.

    Safe to call unconditionally: skipped when JAX has no coordinator
    configuration (single host).
    """
    import os

    if jax.process_count() > 1:
        return  # already initialized
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


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
