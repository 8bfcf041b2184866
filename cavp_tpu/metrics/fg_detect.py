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


def fg_update_weighted(
    confusions: Tuple[jnp.ndarray, ...],
    pred: jnp.ndarray,      # [..., H, W] int, 0-based argmax of the logits
    target: jnp.ndarray,    # [..., H, W]
    weights: Tuple[Optional[jnp.ndarray], ...],  # per-frame 0/1 [...] each
    ignore_index: int = 255,
) -> Tuple[jnp.ndarray, ...]:
    """Shared-work multi-weight confusion update.

    The eval loop keeps ALL + multi-source confusions over the same
    logits, differing only by a per-frame 0/1 weight. The per-frame
    confusion ``onehot(true)^T @ onehot(pred)`` — one MXU matmul per
    frame instead of a serialized scatter over every pixel; bf16 0/1
    inputs with f32 accumulation are exact (< 2^24 counts) at 2x the MXU
    rate — is computed ONCE and contracted with each weight vector
    (exact: per-frame counts are integers in f32). ``None`` = all-ones.
    Weights must be 0/1 per frame (non-binary weights would scale counts
    here; the single-weight reference semantics binarized them).
    """
    n = confusions[0].shape[0]
    t = target.astype(jnp.int32)
    mask = (t >= 0) & (t < n) & (t != ignore_index)

    batch = 1
    for d in target.shape[:-2]:
        batch *= d
    npix = target.shape[-2] * target.shape[-1]
    tf = t.reshape(batch, npix)
    pf = pred.astype(jnp.int32).reshape(batch, npix)
    maskf = mask.reshape(batch, npix)

    classes = jnp.arange(n, dtype=jnp.int32)
    oh_t = ((tf[:, :, None] == classes) & maskf[:, :, None]).astype(
        jnp.bfloat16)
    oh_p = (pf[:, :, None] == classes).astype(jnp.bfloat16)
    conf_f = jnp.einsum("bpi,bpj->bij", oh_t, oh_p,
                        preferred_element_type=jnp.float32)

    out = []
    for conf, w in zip(confusions, weights):
        wv = (jnp.ones((batch,), jnp.float32) if w is None
              else w.reshape(batch).astype(jnp.float32))
        out.append(conf + jnp.einsum("b,bij->ij", wv, conf_f))
    return tuple(out)


def fg_update(
    confusion: jnp.ndarray,
    logits: jnp.ndarray,    # [..., H, W, C]
    target: jnp.ndarray,    # [..., H, W]
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    w = None if weight is None else (weight.astype(bool))
    (out,) = fg_update_weighted((confusion,), pred, target, (w,),
                                ignore_index)
    return out


def _masked_mean(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``vals`` over ``valid`` entries; NaN only when no entry is
    valid (the reference's nanmean-over-present-classes semantics,
    eval_utils.py:124-149). Formulated WITHOUT NaN intermediates: this
    runs eagerly at result time, where ``--debug``'s nan-guard
    (jax_debug_nans, engine/runner.py) checks every op — the previous
    ``nanmean(where(cond, x/y, nan))`` idiom crashed any eval with an
    absent class under it (0/0 in the discarded branch + sentinel NaNs;
    found driving the CLI end-to-end in round 5)."""
    cnt = jnp.sum(valid)
    s = jnp.sum(jnp.where(valid, vals, 0.0))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)


def fg_result(confusion: jnp.ndarray, class_list=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (fdr, f1, f0.3) — eval_utils.py:124-149."""
    tp = jnp.diag(confusion)
    fp = jnp.sum(confusion, axis=0) - tp
    fn = jnp.sum(confusion, axis=1) - tp
    if class_list is not None:
        sel = jnp.asarray(class_list)
        tp, fp, fn = tp[sel], fp[sel], fn[sel]

    # exactness of max(denom, 1): counts are integers in f32, so a valid
    # fdr denominator (pos > 0) is >= 1 and the max is a no-op; f_beta's
    # denom can be sub-1 only when tp = fp = 0 (0.3*fn), where the
    # numerator is 0 and the quotient is 0 under either denominator
    pos = fp + tp
    fdr = _masked_mean(fp / jnp.maximum(pos, 1), pos > 0)

    def f_beta(beta2):
        denom = (1 + beta2) * tp + beta2 * fn + fp
        return _masked_mean((1 + beta2) * tp / jnp.maximum(denom, 1),
                            denom > 0)

    return fdr, f_beta(1.0), f_beta(0.3)
