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


def _frame_hist(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-frame histc(x, bins=num_classes, min=1, max=num_classes) for
    integer values 1..C: x [B, P] int -> [B, C] f32 exact counts.

    A fused compare+reduce (never a scatter — CLAUDE.md rule, scatters
    serialize on TPU). Compare+reduce also beats the round-1 one-hot
    matvec here: the matvec materialized a [P, C] bf16 one-hot operand
    (~570 MB at the eval batch) for the MXU, while this reduction fuses
    the compare into the sum and only ever reads the int maps."""
    classes = jnp.arange(1, num_classes + 1, dtype=x.dtype).reshape(1, 1, -1)
    return jnp.sum(x[:, :, None] == classes, axis=1, dtype=jnp.float32)


def miou_update_weighted(
    states: Tuple[MIoUState, ...],
    pred: jnp.ndarray,     # [..., H, W] int, 0-based argmax of the logits
    target: jnp.ndarray,   # [..., H, W] int (255 = ignore)
    weights: Tuple[Optional[jnp.ndarray], ...],  # per-frame [...] each
    ignore_index: int = 255,
) -> Tuple[MIoUState, ...]:
    """Shared-work multi-weight MIoU update.

    The eval loop maintains several MIoU accumulators over the same
    logits that differ only by a per-frame 0/1 weight (ALL vs the
    multi-source subset — trainer_cavp_avss_image.py:449-471). The
    per-frame histograms are computed ONCE and contracted with each
    weight vector; every count is an exact integer in f32, so the result
    is bitwise equal to running the single-weight update per weight.
    ``None`` in ``weights`` means all-ones.
    """
    num_classes = states[0].inter.shape[0]
    t = jnp.where(target == ignore_index, -1, target).astype(jnp.int32) + 1
    p = pred.astype(jnp.int32) + 1

    batch = 1
    for d in target.shape[:-2]:
        batch *= d
    npix = target.shape[-2] * target.shape[-1]
    tf = t.reshape(batch, npix)
    pf = p.reshape(batch, npix)

    labeled = tf > 0
    correct_f = jnp.sum((pf == tf) & labeled, axis=1, dtype=jnp.float32)
    labeled_f = jnp.sum(labeled, axis=1, dtype=jnp.float32)

    pm = pf * labeled
    inter = pm * (pm == tf)
    h_inter = _frame_hist(inter, num_classes)
    h_pred = _frame_hist(pm, num_classes)
    h_lab = _frame_hist(tf, num_classes)

    out = []
    for st, w in zip(states, weights):
        wv = (jnp.ones((batch,), jnp.float32) if w is None
              else w.reshape(batch).astype(jnp.float32))
        area_inter = wv @ h_inter
        area_union = wv @ h_pred + wv @ h_lab - area_inter
        out.append(MIoUState(
            inter=st.inter + area_inter,
            union=st.union + area_union,
            correct=st.correct + wv @ correct_f,
            labeled=st.labeled + wv @ labeled_f,
        ))
    return tuple(out)


def miou_update(
    state: MIoUState,
    logits: jnp.ndarray,   # [..., H, W, C]
    target: jnp.ndarray,   # [..., H, W] int (255 = ignore)
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,  # [...] 0/1 per-frame validity
) -> MIoUState:
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    (out,) = miou_update_weighted((state,), pred, target, (weight,),
                                  ignore_index)
    return out


def miou_result(state: MIoUState, class_list=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mIoU, acc) — eval_utils.py:43-61 semantics (mean over all
    classes incl. absent ones, spacing-eps denominators)."""
    eps = jnp.float32(2.220446049250313e-16)  # numpy.spacing(1)
    iou = state.inter / (eps + state.union)
    acc = state.correct / (eps + state.labeled)
    if class_list is not None:
        iou = iou[jnp.asarray(class_list)]
    return jnp.mean(iou), acc
