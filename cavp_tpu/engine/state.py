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
        bank = init_bank(config.num_classes, config.batch_size,
                         config.audio_samples)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        sound_bank=bank,
    )
