"""Foreground detection metrics (FDR / F1 / F0.3) via confusion matrix.

Rebuilds ``utils/eval_utils.py:100-156`` (``ForegroundDetect``):
per-frame confusion accumulation (numpy.bincount in the reference; a
scatter-free one-hot matmul here, fully on device — CLAUDE.md rule) and
the FDR / F-beta readouts with NaN-mean semantics over classes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def fg_init(num_classes: int) -> jnp.ndarray:
    return jnp.zeros((num_classes, num_classes), jnp.float32)


def fg_update(
    confusion: jnp.ndarray,
    logits: jnp.ndarray,    # [..., H, W, C]
    target: jnp.ndarray,    # [..., H, W]
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    n = confusion.shape[0]
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = target.astype(jnp.int32)
    mask = (t >= 0) & (t < n) & (t != ignore_index)
    if weight is not None:
        w = weight.reshape(weight.shape + (1, 1)).astype(bool)
        mask = mask & jnp.broadcast_to(w, mask.shape)
    # confusion += onehot(true)^T @ onehot(pred): one MXU matmul instead
    # of a serialized scatter over every pixel. bf16 0/1 inputs with f32
    # accumulation are exact (< 2^24 counts) at 2x the MXU rate.
    classes = jnp.arange(n, dtype=jnp.int32)
    oh_t = ((t.reshape(-1, 1) == classes) & mask.reshape(-1, 1)).astype(
        jnp.bfloat16)
    oh_p = (pred.reshape(-1, 1) == classes).astype(jnp.bfloat16)
    upd = jnp.einsum("pi,pj->ij", oh_t, oh_p,
                     preferred_element_type=jnp.float32)
    return confusion + upd


def _nanmean(x: jnp.ndarray) -> jnp.ndarray:
    finite = jnp.isfinite(x)
    return jnp.sum(jnp.where(finite, x, 0.0)) / jnp.maximum(jnp.sum(finite), 1)


def fg_result(confusion: jnp.ndarray, class_list=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (fdr, f1, f0.3) — eval_utils.py:124-149."""
    tp = jnp.diag(confusion)
    fp = jnp.sum(confusion, axis=0) - tp
    fn = jnp.sum(confusion, axis=1) - tp
    if class_list is not None:
        sel = jnp.asarray(class_list)
        tp, fp, fn = tp[sel], fp[sel], fn[sel]

    fdr = _nanmean(jnp.where(fp + tp > 0, fp / (fp + tp), jnp.nan))

    def f_beta(beta2):
        denom = (1 + beta2) * tp + beta2 * fn + fp
        return _nanmean(jnp.where(denom > 0, (1 + beta2) * tp / denom, jnp.nan))

    return fdr, f_beta(1.0), f_beta(0.3)
