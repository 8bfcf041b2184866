"""Shared-work multi-weight metric updates (round-3 eval-step dedup).

The eval step keeps ALL + multi-source accumulators over the same logits
differing only by a per-frame 0/1 weight; `miou_update_weighted` /
`fg_update_weighted` compute argmax + per-frame histograms once and
contract with each weight. All counts are exact integers in f32, so the
pair update must be BITWISE equal to sequential single-weight updates
(which tests/test_metrics.py anchors against independent numpy)."""

import numpy as np
import jax.numpy as jnp

from cavp_tpu.metrics import (
    fg_init,
    fg_update,
    fg_update_weighted,
    miou_init,
    miou_update,
    miou_update_weighted,
)


def _case(seed, n_classes=7, frames=5, hw=12, adversarial=False):
    rng = np.random.RandomState(seed)
    logits = rng.randn(frames, hw, hw, n_classes).astype(np.float32)
    target = rng.randint(0, n_classes, size=(frames, hw, hw))
    target[0, :3, :3] = 255            # ignore pixels
    if adversarial:
        target[1, :2, :] = n_classes + 9   # out-of-range label value
        target[2, ...] = 255               # fully-ignored frame
    w_all = (rng.rand(frames) > 0.2).astype(np.float32)
    w_ms = w_all * (rng.rand(frames) > 0.5).astype(np.float32)
    return (jnp.asarray(logits), jnp.asarray(target),
            jnp.asarray(w_all), jnp.asarray(w_ms))


def _assert_bitwise_miou(pair, singles):
    for got, want in zip(pair, singles):
        for f in ("inter", "union", "correct", "labeled"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)))


class TestMIoUWeightedPair:
    def test_pair_equals_sequential_singles(self):
        for seed, adv in [(0, False), (1, True)]:
            logits, target, w_all, w_ms = _case(seed, adversarial=adv)
            n = logits.shape[-1]
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            pair = miou_update_weighted(
                (miou_init(n), miou_init(n)), pred, target, (w_all, w_ms))
            singles = (
                miou_update(miou_init(n), logits, target, weight=w_all),
                miou_update(miou_init(n), logits, target, weight=w_ms),
            )
            _assert_bitwise_miou(pair, singles)

    def test_none_weight_is_all_ones(self):
        logits, target, _, _ = _case(2)
        n = logits.shape[-1]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        (got,) = miou_update_weighted((miou_init(n),), pred, target, (None,))
        want = miou_update(miou_init(n), logits, target)
        _assert_bitwise_miou((got,), (want,))

    def test_counts_are_integers(self):
        logits, target, w_all, _ = _case(3)
        n = logits.shape[-1]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        (st,) = miou_update_weighted((miou_init(n),), pred, target, (w_all,))
        for f in ("inter", "union", "correct", "labeled"):
            v = np.asarray(getattr(st, f))
            np.testing.assert_array_equal(v, np.round(v))


class TestFgWeightedPair:
    def test_pair_equals_sequential_singles(self):
        for seed, adv in [(4, False), (5, True)]:
            logits, target, w_all, w_ms = _case(seed, adversarial=adv)
            n = logits.shape[-1]
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            pair = fg_update_weighted(
                (fg_init(n), fg_init(n)), pred, target, (w_all, w_ms))
            singles = (
                fg_update(fg_init(n), logits, target, weight=w_all),
                fg_update(fg_init(n), logits, target, weight=w_ms),
            )
            for got, want in zip(pair, singles):
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(want))

    def test_none_weight_is_all_ones(self):
        logits, target, _, _ = _case(6)
        n = logits.shape[-1]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        (got,) = fg_update_weighted((fg_init(n),), pred, target, (None,))
        want = fg_update(fg_init(n), logits, target)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
