"""Train state: the explicit pytree replacing the reference's mutable
trainer/engine objects (``engine/engine.py:17-31`` State registry)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    sound_bank: Optional[jnp.ndarray] = None


def create_train_state(model, tx, rng, sample_batch, config) -> TrainState:
    """Initialize params/batch_stats/opt state from a sample batch."""
    variables = model.init(rng, sample_batch["image"], sample_batch["audio"],
                           eval_mode=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    bank = None
    if config is not None:
        from cavp_tpu.models.soundbank import init_bank

        # Bank depth matches the aggregate of the reference's per-worker
        # banks: each of gpus x nodes DDP workers keeps a batch_size-deep
        # FIFO fed batch_size items/step (trainer_cavp_vpo_stereo.py:
        # 30-36). Our single replicated bank sees the GLOBAL batch per
        # step, so depth scales with the world or eviction runs
        # world-times faster than the reference.
        depth = config.batch_size * max(getattr(config, "gpus", 1), 1) \
            * max(getattr(config, "nodes", 1), 1)
        bank = init_bank(config.num_classes, depth, config.audio_samples)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        sound_bank=bank,
    )
