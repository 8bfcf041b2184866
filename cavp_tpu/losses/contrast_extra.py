"""Secondary contrastive objectives, static-shape.

Rebuilds the loss zoo the reference's ``Losser`` holds but does not use
in the active objective (SURVEY.md §2.5): these are capability-parity
implementations, jit-safe via fixed budgets + validity masks.

- :func:`supcon_loss`       — ``loss/sup_contrastive.py:11-98`` (Khosla).
- :func:`av_contrast_loss`  — ``loss/av_contrast.py:8-112`` (audio vs
  masked-mean visual embedding InfoNCE; assumes single-source images as
  the reference's ``torch.stack`` of per-image uniques does).
- :func:`pixel_contrast_loss` — ``loss/contrastive.py:8-169``
  (ContrastiveSeg hard-anchor pixel InfoNCE).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cavp_tpu.ops.interp import interpolate_bilinear, interpolate_nearest

_NEG_INF = -1e9


def _info_nce_core(features, mask, logits_mask, temperature, base_temperature,
                   valid_rows=None, eps=0.0):
    """The shared SupCon log-prob core (sup_contrastive.py:68-96):
    denominator = sum of exp over ALL non-self pairs (positives incl.)."""
    dots = (features @ features.T) / temperature
    logits_max = jax.lax.stop_gradient(jnp.max(dots, axis=1, keepdims=True))
    logits = dots - logits_max
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-30)
    pos = mask * logits_mask
    mean_log_prob_pos = jnp.sum(pos * log_prob, axis=1) / (jnp.sum(pos, axis=1) + (eps or 1e-12))
    loss_vec = -(temperature / base_temperature) * mean_log_prob_pos
    if valid_rows is not None:
        loss_vec = jnp.where(valid_rows, loss_vec, 0.0)
        return jnp.sum(loss_vec) / jnp.maximum(jnp.sum(valid_rows), 1)
    return jnp.mean(loss_vec)


def _pixelcontrast_core(features, mask, logits_mask, temperature,
                        valid_rows, eps):
    """PixelContrastLoss._contrastive (contrastive.py:93-137): per-pair
    denominator ``exp(logits_ij) + sum-of-NEGATIVES`` — other positives
    are NOT in the denominator (unlike SupCon). base_temperature ==
    temperature in the reference ctor, so the leading factor is 1."""
    pair_valid = valid_rows[:, None] * valid_rows[None, :]
    dots = (features @ features.T) / temperature
    dots = jnp.where(pair_valid > 0, dots, _NEG_INF)
    logits_max = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(dots, axis=1, keepdims=True), _NEG_INF / 2))
    logits = dots - logits_max
    exp_logits = jnp.exp(jnp.where(pair_valid > 0, logits, _NEG_INF))
    neg_mask = (1.0 - mask) * pair_valid
    neg_sum = jnp.sum(exp_logits * neg_mask, axis=1, keepdims=True)
    log_prob = logits - jnp.log(exp_logits + neg_sum + 1e-30)
    pos = mask * logits_mask
    mean_log_prob_pos = jnp.sum(pos * log_prob, axis=1) / (
        jnp.sum(pos, axis=1) + eps)
    loss_vec = jnp.where(valid_rows > 0, -mean_log_prob_pos, 0.0)
    return jnp.sum(loss_vec) / jnp.maximum(jnp.sum(valid_rows), 1.0)


def supcon_loss(features: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                temperature: float = 0.07, base_temperature: float = 0.07):
    """features [B, n_views, D]; labels [B] (None -> SimCLR eye mask)."""
    b, n_views, d = features.shape
    # view-major flatten, like torch cat(unbind(dim=1))
    flat = jnp.concatenate(jnp.split(features, n_views, axis=1), axis=0).reshape(
        b * n_views, d)
    if labels is None:
        mask = jnp.eye(b)
    else:
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    mask = jnp.tile(mask, (n_views, n_views))
    logits_mask = 1.0 - jnp.eye(b * n_views)
    return _info_nce_core(flat, mask, logits_mask, temperature, base_temperature)


def av_contrast_loss(f_v: jnp.ndarray, f_a: jnp.ndarray, labels: jnp.ndarray,
                     temperature: float = 0.1, ignore_index: int = 255,
                     feat_hw=(128, 128)):
    """f_v [B, HW, C] visual tokens, f_a [B, C] audio embeds, labels [B, H, W].

    av_contrast.py:85-112: per-image masked mean of (L2-normalized)
    visual tokens over foreground pixels, then a 2-view SupCon between
    audio and pooled-visual with per-image single-source class targets.
    """
    b, hw, c = f_v.shape
    eps = 1e-12
    f_v = f_v / jnp.maximum(jnp.linalg.norm(f_v, axis=1, keepdims=True), eps)
    f_a = f_a / jnp.maximum(jnp.linalg.norm(f_a, axis=1, keepdims=True), eps)

    lab = interpolate_nearest(labels, feat_hw).reshape(b, -1)
    fg = ((lab != 0) & (lab != ignore_index)).astype(jnp.float32)
    masked_v = jnp.sum(fg[..., None] * f_v, axis=1) / (
        jnp.sum(fg, axis=1, keepdims=True) + eps)

    # per-image target class: the reference stacks per-image uniques and
    # therefore assumes exactly one foreground class; we take the smallest
    # present fg class, with empty images masked out (zero_idx handling).
    big = ignore_index + 1
    cand = jnp.where((lab != 0) & (lab != ignore_index), lab, big)
    target = jnp.min(cand, axis=1)
    has_fg = target < big
    target = jnp.where(has_fg, target, ignore_index)

    features = jnp.concatenate([f_a, masked_v], axis=0)  # [2B, C] view-major
    mask = (target[:, None] == target[None, :]).astype(jnp.float32)
    mask = jnp.where(has_fg[:, None], mask, 0.0)  # zero_idx rows
    mask = jnp.tile(mask, (2, 2))
    logits_mask = 1.0 - jnp.eye(2 * b)
    return _info_nce_core(features, mask, logits_mask, temperature, temperature,
                          eps=eps)


def pixel_contrast_loss(
    key: jax.Array,
    feats: jnp.ndarray,      # [B, h, w, C] projected visual feature
    logits: jnp.ndarray,     # [B, H, W, num_classes]
    labels: jnp.ndarray,     # [B, H, W]
    temperature: float = 0.1,
    max_views: int = 100,
    slots_per_image: int = 4,
    ignore_index: int = 255,
):
    """contrastive.py:8-169 with static (image, class)-slot budgets.

    Reference semantics (`_hard_anchor_sampling(X, y=predict,
    y_hat=labels, conf)`, contrastive.py:19-91): eligible classes come
    from the GT label map (GT count > max_views, ignore excluded,
    background included); per eligible (image, class), HARD anchors are
    labeled-cls-but-mispredicted pixels (false negatives) and EASY are
    correctly predicted, keeping n_view//2 hard + rest easy (falling
    back to whichever side is short, contrastive.py:69-78). The InfoNCE
    uses the per-pair ``exp(logit) + sum-of-negatives`` denominator
    (contrastive.py:121-131), NOT the SupCon all-pairs denominator.
    """
    b, h, w, c_dim = feats.shape
    n_view = max_views
    n2 = n_view // 2
    eps = 1e-12

    feats = feats.reshape(b, h * w, c_dim)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), eps)

    pred_logits = interpolate_bilinear(logits, (h, w), align_corners=False)
    predict = jnp.argmax(pred_logits, axis=-1).reshape(b, h * w)
    lab = interpolate_nearest(labels, (h, w)).reshape(b, h * w)

    num_classes = logits.shape[-1]
    # eligible classes per image from the GT map: count > max_views
    # (compare+reduce histogram — scatters serialize on TPU, CLAUDE.md);
    # ignore_index pixels fall outside [0, num_classes) automatically
    counts = jnp.sum(
        (lab[:, :, None] == jnp.arange(num_classes)[None, None, :]
         ).astype(jnp.int32), axis=1)            # [B, num_classes]
    eligible = counts > max_views

    big = num_classes + 1
    slot_cls = jnp.sort(
        jnp.where(eligible, jnp.arange(num_classes)[None, :], big), axis=1
    )[:, :slots_per_image]                       # [B, S]
    slot_valid = slot_cls < big

    keys = jax.random.split(key, b * slots_per_image * 2).reshape(
        b, slots_per_image, 2, 2)

    def per_slot(img_feats, img_pred, img_lab, cls, kpair):
        # hard = false negatives, easy = true positives (contrastive.py:61-64)
        hard = (img_lab == cls) & (img_pred != cls)
        easy = (img_lab == cls) & (img_pred == cls)
        nh = jnp.sum(hard)
        ne = jnp.sum(easy)
        nhk = jnp.where((nh >= n2) & (ne >= n2), n2,
                        jnp.where(nh >= n2, n_view - ne, nh))
        nhk = jnp.clip(nhk, 0, n_view)

        def draw(k, m):
            s = jax.random.uniform(k, (h * w,))
            s = jnp.where(m, s, _NEG_INF)
            _, idx = jax.lax.top_k(s, n_view)
            return idx

        hard_idx = draw(kpair[0], hard)
        easy_idx = draw(kpair[1], easy)
        j = jnp.arange(n_view)
        take_hard = j < nhk
        idx = jnp.where(take_hard, hard_idx, easy_idx[jnp.maximum(j - nhk, 0)])
        return img_feats[idx]

    sampled = jax.vmap(
        lambda f, p, l, cls_row, krow: jax.vmap(
            lambda cls, kk: per_slot(f, p, l, cls, kk))(cls_row, krow)
    )(feats, predict, lab, slot_cls, keys)        # [B, S, n_view, C]

    total = b * slots_per_image
    x = sampled.reshape(total, n_view, c_dim)
    y = slot_cls.reshape(total)
    valid = slot_valid.reshape(total)

    # _contrastive (contrastive.py:93-137): view-major flatten
    flat = jnp.concatenate(jnp.split(x, n_view, axis=1), axis=0).reshape(
        total * n_view, c_dim)
    vmask = jnp.tile(valid, n_view).astype(jnp.float32)
    same = (y[:, None] == y[None, :]).astype(jnp.float32)
    same = same * valid[:, None] * valid[None, :]
    mask = jnp.tile(same, (n_view, n_view))
    logits_mask = (1.0 - jnp.eye(total * n_view)) * vmask[None, :] * vmask[:, None]
    return _pixelcontrast_core(flat, mask, logits_mask, temperature,
                               valid_rows=vmask, eps=eps)
