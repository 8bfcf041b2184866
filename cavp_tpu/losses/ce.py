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
    """logits [..., C] (channels-last), labels [...] int. Mean over valid.

    Formulated as ``logsumexp - <x, one_hot>`` rather than
    ``take_along_axis(log_softmax)``: the gather's backward is a scatter
    into the full logit tensor, which serializes on TPU (measured 30 ms
    per step at [32,224,224,71] — as long as the entire backbone
    backward); the one-hot contraction fuses to elementwise compare ops
    in both directions.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    x = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    picked = jnp.sum(
        x * jax.nn.one_hot(safe, num_classes, dtype=x.dtype), axis=-1)
    nll = jnp.where(valid, lse - picked, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def multilabel_soft_margin(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MultiLabelSoftMarginLoss parity (held by the reference
    Losser; unused in the active objective — kept for capability parity)."""
    x = logits.astype(jnp.float32)
    loss = targets * jax.nn.log_sigmoid(x) + (1 - targets) * jax.nn.log_sigmoid(-x)
    return -jnp.mean(jnp.mean(loss, axis=-1))
