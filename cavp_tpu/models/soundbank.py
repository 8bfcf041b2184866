"""SoundBank: per-class FIFO queues as explicit carried state.

Rebuilds the *waveform-level* SoundBank that the trainers actually use
(``trainer_cavp_avss_image.py:62-64,93-121,186-197`` and the VPO variant
``trainer_cavp_vpo_stereo.py:30-68``) plus the overwrite-miss-match
logic, as pure functions over a fixed-shape ``[num_classes, bank_size,
dim]`` array carried through the train step. (The model-level
feature bank in ``models/cavp_model.py:21-52`` is dead code — see
cavp.py docstring.)

Semantics preserved:
- ``update_bank``: for each sample, zero the background label; samples
  with exactly one remaining source class (AVSS variant) — or each
  source class (VPO variant) — are enqueued FIFO into that class's row,
  sequentially in batch order.
- ``overwrite_miss_match``: of the mismatched pairs, a random
  ``ow_rate`` fraction is converted into *matched* pairs by (a) marking
  them matched with the original GT and (b) substituting the oldest
  banked waveform of the sample's (single-source) class.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def init_bank(num_classes: int, bank_size: int, dim: int) -> jnp.ndarray:
    return jnp.zeros((num_classes, bank_size, dim), jnp.float32)


def _fg_labels(img_label: jnp.ndarray) -> jnp.ndarray:
    """Zero out the background column (update_bank's img_label[:,0]=0)."""
    return img_label.at[:, 0].set(0)


def single_source_class(img_label: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (class_idx [B], is_single [B]): the unique foreground class
    of single-source samples."""
    fg = _fg_labels(img_label)
    count = jnp.sum(fg > 0, axis=1)
    cls = jnp.argmax(fg, axis=1)
    return cls.astype(jnp.int32), count == 1


def _enqueue_mask(img_label: jnp.ndarray, num_classes: int,
                  per_label: bool) -> jnp.ndarray:
    """mask[c, i] = sample i enqueues into class row c (bool [C, B])."""
    fg = _fg_labels(img_label)
    if per_label:
        return (fg > 0).T
    cls, single = single_source_class(img_label)
    return (jnp.arange(num_classes)[:, None] == cls[None, :]) & single[None, :]


def update_bank(bank: jnp.ndarray, items: jnp.ndarray,
                img_label: jnp.ndarray, per_label: bool = False) -> jnp.ndarray:
    """FIFO-enqueue ``items`` [B, dim] by class, sequential batch order.

    per_label=False: AVSS semantics (only single-source samples enqueue,
    cavp_model.py:29-38). per_label=True: VPO semantics (every fg label
    of every sample enqueues, trainer_cavp_vpo_stereo.py:38-54).

    Vectorized, scatter-free: class rows are independent and within a
    row enqueues happen in batch order, so the sequential reference
    update equals, per class c with m_c enqueued items,
    ``concat(row[m_c:], items_of_c)`` — computed for all classes at once
    as a one-hot matmul (items gathered by per-class rank) followed by a
    windowed gather. Replaces a B×C chain of dynamic-slice conds that
    serialized on TPU (the pattern CLAUDE.md warns about).
    """
    B = items.shape[0]
    C, N, _ = bank.shape

    mask = _enqueue_mask(img_label, C, per_label)          # [C, B] bool
    mi = mask.astype(jnp.int32)
    rank = jnp.cumsum(mi, axis=1) - mi                     # [C, B] 0-based
    # one-hot scatter-as-matmul: W[c, r, i] = (i is the r-th enqueue of c)
    W = (mask[:, None, :]
         & (rank[:, None, :] == jnp.arange(B)[None, :, None]))
    items_by_rank = jnp.einsum(
        "cri,id->crd", W.astype(items.dtype), items)       # [C, B, dim]
    m = jnp.sum(mi, axis=1)                                # [C]

    # new_row[c, j] = concat(row, items_by_rank)[c, m_c + j]; when
    # m_c > N this window lands entirely in the items, keeping the
    # newest N — exactly the FIFO semantics.
    combined = jnp.concatenate([bank, items_by_rank], axis=1)  # [C, N+B, d]
    idx = m[:, None] + jnp.arange(N)[None, :]              # [C, N]
    return jnp.take_along_axis(combined, idx[:, :, None], axis=1)


def _update_bank_loop(bank: jnp.ndarray, items: jnp.ndarray,
                      img_label: jnp.ndarray,
                      per_label: bool = False) -> jnp.ndarray:
    """Direct sequential transcription of the reference FIFO
    (cavp_model.py:29-44) — kept as the equivalence oracle for tests."""
    fg = _fg_labels(img_label)
    B = items.shape[0]
    num_classes = bank.shape[0]

    if per_label:
        def body(i, b):
            def inner(c, bb):
                row = jnp.concatenate([bb[c, 1:], items[i][None]], axis=0)
                return jax.lax.cond(fg[i, c] > 0,
                                    lambda x: x.at[c].set(row),
                                    lambda x: x, bb)
            return jax.lax.fori_loop(0, num_classes, inner, b)
        return jax.lax.fori_loop(0, B, body, bank)

    cls, single = single_source_class(img_label)

    def body(i, b):
        c = cls[i]
        row = jnp.concatenate([b[c, 1:], items[i][None]], axis=0)
        return jax.lax.cond(single[i], lambda x: x.at[c].set(row),
                            lambda x: x, b)

    return jax.lax.fori_loop(0, B, body, bank)


def overwrite_from_bank(bank: jnp.ndarray, shuffled: jnp.ndarray,
                        change_mask: jnp.ndarray,
                        target_class: jnp.ndarray) -> jnp.ndarray:
    """shuffled[i] <- bank[target_class[i], 0] where change_mask
    (SoundBank.overwrite_audio_feature, trainer bank variant)."""
    fake = bank[target_class, 0]
    return jnp.where(change_mask[:, None], fake, shuffled)


class OverwriteResult(NamedTuple):
    if_match: jnp.ndarray        # [B] bool, updated
    shuffle_img_label: jnp.ndarray  # [B, C], updated
    change_mask: jnp.ndarray     # [B] bool — pairs converted to matched
    target_class: jnp.ndarray    # [B] int — class to pull from the bank


def overwrite_miss_match(
    key: jax.Array,
    if_match: jnp.ndarray,
    shuffle_img_label: jnp.ndarray,
    img_label: jnp.ndarray,
    ow_rate: float,
    filter_bg_only: bool = False,
    enabled=True,
) -> OverwriteResult:
    """trainer_cavp_avss_image.py:93-121 (stereo variant adds the
    background-only filter, trainer_cavp_vpo_stereo.py:122-164).

    Selects floor(n_false * ow_rate) random mismatched pairs, drops
    multi-source (and optionally bg-only) samples, marks the rest
    matched with their true labels. Static-shape via random-score
    thresholding at the k-th order statistic.
    """
    B = if_match.shape[0]
    cls, single = single_source_class(img_label)
    mismatched = ~if_match

    n_false = jnp.sum(mismatched)
    k = jnp.floor(n_false.astype(jnp.float32) * ow_rate).astype(jnp.int32)

    r = jax.random.uniform(key, (B,))
    scores = jnp.where(mismatched, r, -jnp.inf)
    sorted_desc = jnp.sort(scores)[::-1]
    kth = sorted_desc[jnp.clip(k - 1, 0, B - 1)]
    selected = mismatched & (scores >= kth) & (k > 0)

    # Filter MS (and bg-only for stereo): keep single-source only.
    selected = selected & single
    if filter_bg_only:
        bg_only = jnp.sum(img_label, axis=1) == 1
        selected = selected & ~bg_only
    selected = selected & jnp.asarray(enabled, bool)

    new_if_match = if_match | selected
    new_shuffle_label = jnp.where(selected[:, None], img_label,
                                  shuffle_img_label)
    return OverwriteResult(new_if_match, new_shuffle_label, selected, cls)
