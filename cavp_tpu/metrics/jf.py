"""AVSBench J&F metrics, on-device.

Rebuilds ``utils/avsbench_utils.py:229-304`` (``mask_iou`` = J,
``Eval_Fmeasure`` = F with the 255-threshold sweep) and
``utils/avsbench_metrics.py:23-77`` (``calc_color_miou_fscore``,
per-frame multi-class iou/fscore accumulators for the semantics J&F).

The F-measure threshold sweep is re-derived as a histogram + reverse
cumulative sum: for thresholds t_i = linspace(0, 1-1e-10, 255),
``#{p : pred_p >= t_i}`` equals the count of pixels whose
``searchsorted`` bucket exceeds i — O(HW + 255) instead of the
reference's O(255*HW) loop, numerically identical.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS_SPACING = 2.220446049250313e-16


def mask_iou(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Binary J measure — avsbench_utils.py:229-254.

    pred/target: [N, H, W] with {0,1} values. Empty-GT frames score
    background IoU (inter = bg-match count, union = all pixels).
    ``weight`` ([N] 0/1) masks padded frames; the mean divides by the
    weighted count like the reference's N.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    num_pixels = pred.shape[-1] * pred.shape[-2]
    no_obj = jnp.sum(target, axis=(1, 2)) == 0

    inter = jnp.sum(pred * target, axis=(1, 2))
    union = jnp.sum(jnp.maximum(pred, target), axis=(1, 2))
    inter_no_obj = jnp.sum((1 - target) * (1 - pred), axis=(1, 2))
    inter = jnp.where(no_obj, inter_no_obj, inter)
    union = jnp.where(no_obj, float(num_pixels), union)

    iou = inter / (union + eps)
    if weight is None:
        return jnp.mean(iou)
    w = weight.astype(jnp.float32)
    return jnp.sum(iou * w) / jnp.maximum(jnp.sum(w), 1.0)


def _pr_curves(pred: jnp.ndarray, gt: jnp.ndarray, pr_num: int = 255
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image precision/recall over pr_num thresholds via histograms.

    pred: [H, W] probabilities in [0, 1]; gt: [H, W] {0,1}.
    Equivalent to ``_eval_pr`` (avsbench_utils.py:257-270).
    """
    thlist = jnp.linspace(0.0, 1.0 - 1e-10, pr_num)
    flat = pred.reshape(-1)
    gt_flat = gt.reshape(-1).astype(jnp.float32)
    # bucket b = #thresholds <= pred  (in 0..pr_num)
    bucket = jnp.searchsorted(thlist, flat, side="right")
    # compare+reduce histograms (scatter-free; fuses on TPU)
    bins = jnp.arange(pr_num + 1, dtype=bucket.dtype).reshape(1, -1)
    onehot = (bucket.reshape(-1, 1) == bins).astype(jnp.float32)
    hist_all = jnp.sum(onehot, axis=0)
    hist_tp = jnp.sum(onehot * gt_flat.reshape(-1, 1), axis=0)
    # count_i = #{p : bucket_p > i} = sum_{b > i} hist[b]
    rev = lambda h: (jnp.cumsum(h[::-1])[::-1])[1:]
    y_temp_sum = rev(hist_all)
    tp = rev(hist_tp)
    prec = tp / (y_temp_sum + 1e-20)
    recall = tp / (jnp.sum(gt_flat) + 1e-20)
    return prec, recall


def eval_fmeasure(pred: jnp.ndarray, gt: jnp.ndarray, pr_num: int = 255,
                  weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """F measure — avsbench_utils.py:273-304.

    pred: [N, H, W] class-1 probabilities; gt: [N, H, W] {0,1}.
    All-black-GT frames are skipped; returns max over thresholds of the
    mean F0.3 curve.
    """
    beta2 = 0.3
    prec, recall = jax.vmap(lambda p, g: _pr_curves(p, g, pr_num))(pred, gt)
    f = (1 + beta2) * prec * recall / (beta2 * prec + recall)
    f = jnp.nan_to_num(f, nan=0.0)
    keep = (jnp.mean(gt.astype(jnp.float32), axis=(1, 2)) > 0)
    if weight is not None:
        keep = keep & (weight > 0)
    kf = keep.astype(jnp.float32)
    img_num = jnp.maximum(jnp.sum(kf), 1.0)
    score = jnp.sum(f * kf[:, None], axis=0) / img_num
    return jnp.max(score)


def color_miou_fscore(
    logits: jnp.ndarray,   # [BF, H, W, C]
    target: jnp.ndarray,   # [BF, H, W]
    weight: Optional[jnp.ndarray] = None,  # [BF]
    beta2: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-class per-frame iou/fscore accumulators
    (``_batch_miou_fscore``, avsbench_metrics.py:23-64). Returns
    (ious [C], fscores [C], cls_count [C]) summed over frames; callers
    accumulate across batches and finish with sum(iou)/sum(count) per
    class.
    """
    nclass = logits.shape[-1]
    predict = jnp.argmax(logits, axis=-1).astype(jnp.float32) + 1
    tgt = target.astype(jnp.float32) + 1
    predict = predict * (tgt > 0)
    intersection = predict * (predict == tgt)

    def hist(x):
        flat = x.reshape(-1, 1)
        classes = jnp.arange(1, nclass + 1, dtype=x.dtype).reshape(1, -1)
        return jnp.sum((flat == classes).astype(jnp.float32), axis=0)

    def per_frame(p, i, t):
        area_inter = hist(i)
        area_pred = hist(p)
        area_lab = hist(t)
        area_union = area_pred + area_lab - area_inter
        iou = area_inter / (_EPS_SPACING + area_union)
        count = (area_union > 0).astype(jnp.float32)
        precision = area_inter / area_pred
        recall = area_inter / area_lab
        fscore = (1 + beta2) * precision * recall / (beta2 * precision + recall)
        fscore = jnp.nan_to_num(fscore, nan=0.0)
        return iou, fscore, count

    ious, fscores, counts = jax.vmap(per_frame)(predict, intersection, tgt)
    if weight is not None:
        w = weight.astype(jnp.float32)[:, None]
        ious, fscores, counts = ious * w, fscores * w, counts * w
    return jnp.sum(ious, axis=0), jnp.sum(fscores, axis=0), jnp.sum(counts, axis=0)
