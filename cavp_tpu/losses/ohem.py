"""OHEM cross-entropy (unused by the reference trainers; parity item).

Rebuilds ``loss/losser.py:8-46`` (``ProbOhemCrossEntropy2d``): keep
pixels whose predicted-class probability is below a threshold, where the
threshold is raised to the min_kept-th smallest probability when needed.
Static-shape via sort instead of dynamic filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cavp_tpu.losses.ce import cross_entropy


def ohem_cross_entropy(
    logits: jnp.ndarray,   # [B, H, W, C]
    labels: jnp.ndarray,   # [B, H, W]
    ignore_index: int = 255,
    thresh: float = 0.6,
    min_kept: int = 256,
) -> jnp.ndarray:
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index

    # reference gates ALL filtering on min_kept > 0 (losser.py:34) and
    # skips it when min_kept > num_valid (losser.py:28-29)
    if min_kept <= 0:
        return cross_entropy(flat_logits, flat_labels, ignore_index)

    safe = jnp.where(valid, flat_labels, 0).astype(jnp.int32)
    prob = jax.nn.softmax(flat_logits.astype(jnp.float32), axis=-1)
    gt_prob = jnp.take_along_axis(prob, safe[:, None], axis=-1)[:, 0]
    gt_prob = jnp.where(valid, gt_prob, 1.0)  # masked_fill_(~valid, 1)

    num_valid = jnp.sum(valid)
    sorted_prob = jnp.sort(gt_prob)
    k = jnp.minimum(min_kept, gt_prob.shape[0]) - 1
    kth = sorted_prob[jnp.maximum(k, 0)]
    threshold = jnp.where(kth > thresh, kth, thresh)
    kept = gt_prob <= threshold

    apply = (num_valid > 0) & (num_valid >= min_kept)
    drop = valid & ~kept
    new_labels = jnp.where(apply & drop, ignore_index, flat_labels)
    return cross_entropy(flat_logits, new_labels, ignore_index)
