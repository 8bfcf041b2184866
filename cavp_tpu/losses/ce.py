"""Cross-entropy with ignore_index, torch parity.

Rebuilds ``loss/losser.py:49-62`` (``nn.CrossEntropyLoss(ignore_index=255)``
with mean reduction over non-ignored pixels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """logits [..., C] (channels-last), labels [...] int. Mean over valid."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def multilabel_soft_margin(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MultiLabelSoftMarginLoss parity (held by the reference
    Losser; unused in the active objective — kept for capability parity)."""
    x = logits.astype(jnp.float32)
    loss = targets * jax.nn.log_sigmoid(x) + (1 - targets) * jax.nn.log_sigmoid(-x)
    return -jnp.mean(jnp.mean(loss, axis=-1))
