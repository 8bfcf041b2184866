"""Streaming mean-IoU / pixel-accuracy, on-device.

Rebuilds ``utils/eval_utils.py:33-97`` (``MIoU``): the same +1 class
shift, ignore->-1 handling, and histogram-based intersection/union —
but as a pure functional accumulator (a small state pytree updated
inside the jitted eval step) instead of per-frame ``.cpu()`` syncs,
which is where most of the reference's eval wall-clock went
(SURVEY.md §3.5 hot loops).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class MIoUState(NamedTuple):
    inter: jnp.ndarray    # [num_classes] f64-ish accumulators (f32 ok)
    union: jnp.ndarray    # [num_classes]
    correct: jnp.ndarray  # scalar
    labeled: jnp.ndarray  # scalar


def miou_init(num_classes: int) -> MIoUState:
    z = jnp.zeros((num_classes,), jnp.float32)
    s = jnp.zeros((), jnp.float32)
    return MIoUState(z, z, s, s)


def _class_hist(x: jnp.ndarray, num_classes: int, weights: jnp.ndarray) -> jnp.ndarray:
    """histc(x, bins=num_classes, min=1, max=num_classes) for integer
    values 1..C. Expressed as a weighted one-hot matvec (not scatter-add):
    TPUs run it on the MXU with exact f32 accumulation of bf16 0/1
    products, whereas scatters serialize."""
    flat = x.reshape(-1, 1)
    w = weights.reshape(-1).astype(jnp.bfloat16)
    classes = jnp.arange(1, num_classes + 1, dtype=x.dtype).reshape(1, -1)
    onehot = (flat == classes).astype(jnp.bfloat16)
    return jnp.einsum("p,pc->c", w, onehot,
                      preferred_element_type=jnp.float32)


def miou_update(
    state: MIoUState,
    logits: jnp.ndarray,   # [..., H, W, C]
    target: jnp.ndarray,   # [..., H, W] int (255 = ignore)
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,  # [...] 0/1 per-frame validity
) -> MIoUState:
    num_classes = state.inter.shape[0]
    target = jnp.where(target == ignore_index, -1, target)
    predict = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
    target = target.astype(jnp.int32) + 1

    if weight is None:
        w = jnp.ones(target.shape[:-2] + (1, 1), jnp.float32)
    else:
        w = weight.reshape(weight.shape + (1, 1)).astype(jnp.float32)
    w = jnp.broadcast_to(w, target.shape)

    labeled_mask = (target > 0).astype(jnp.float32) * w
    correct = jnp.sum(((predict == target) & (target > 0)).astype(jnp.float32) * w)
    labeled = jnp.sum(labeled_mask)

    predict_m = predict * (target > 0)
    intersection = predict_m * (predict_m == target)
    area_inter = _class_hist(intersection, num_classes, w)
    area_pred = _class_hist(predict_m, num_classes, w)
    area_lab = _class_hist(target, num_classes, w)
    area_union = area_pred + area_lab - area_inter

    return MIoUState(
        inter=state.inter + area_inter,
        union=state.union + area_union,
        correct=state.correct + correct,
        labeled=state.labeled + labeled,
    )


def miou_result(state: MIoUState, class_list=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mIoU, acc) — eval_utils.py:43-61 semantics (mean over all
    classes incl. absent ones, spacing-eps denominators)."""
    eps = jnp.float32(2.220446049250313e-16)  # numpy.spacing(1)
    iou = state.inter / (eps + state.union)
    acc = state.correct / (eps + state.labeled)
    if class_list is not None:
        iou = iou[jnp.asarray(class_list)]
    return jnp.mean(iou), acc
