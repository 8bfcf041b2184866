"""Single-step training tests (SURVEY.md §4d): loss decreases over a few
steps on a tiny fixed batch, grads finite, SoundBank FIFO semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.engine.loops import make_train_step
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import TrainState, create_train_state
from cavp_tpu.models import CAVP
from cavp_tpu.models.soundbank import (
    init_bank,
    overwrite_miss_match,
    update_bank,
)


def tiny_config():
    cfg = get_config("avss")
    return cfg.replace(
        num_classes=5, batch_size=4, image_width=64, image_height=64,
        max_view=8, class_slots=3, epochs=2, compute_dtype="float32")


def tiny_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B = cfg.batch_size
    img = rng.randn(B, 64, 64, 3).astype(np.float32)
    wave = (rng.rand(B, 1, cfg.audio_samples).astype(np.float32) - 0.5)
    pix = rng.randint(0, cfg.num_classes, (B, 64, 64)).astype(np.int32)
    img_label = np.zeros((B, cfg.num_classes), np.int32)
    img_label[:, 0] = 1
    for i in range(B):
        img_label[i, 1 + i % (cfg.num_classes - 1)] = 1
    return {
        "image": jnp.asarray(img),
        "waveform": jnp.asarray(wave),
        "pix_label": jnp.asarray(pix),
        "img_label": jnp.asarray(img_label),
    }


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        model = CAVP(num_classes=cfg.num_classes, visual_backbone=18,
                     audio_backbone="vgg")
        tx, schedule = make_optimizer(cfg.replace(lr=1e-2))
        batch = tiny_batch(cfg)
        sample = {"image": batch["image"][:1],
                  "audio": jnp.zeros((1, 96, 64, 1))}
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                                   cfg)
        step = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
        return cfg, model, step, state, batch

    def test_loss_decreases_and_finite(self, setup):
        cfg, model, step, state, batch = setup
        rng = jax.random.PRNGKey(42)
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, rng, jnp.asarray(0))
            losses.append(float(metrics["loss/loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_soundbank_updates_when_enabled(self, setup):
        cfg, model, step, state, batch = setup
        rng = jax.random.PRNGKey(1)
        new_state, _ = step(state, batch, rng, jnp.asarray(1))
        assert not np.allclose(np.asarray(new_state.sound_bank),
                               np.asarray(state.sound_bank))

    def test_params_change(self, setup):
        cfg, model, step, state, batch = setup
        new_state, _ = step(state, batch, jax.random.PRNGKey(2),
                            jnp.asarray(0))
        p0 = jax.tree_util.tree_leaves(state.params)
        p1 = jax.tree_util.tree_leaves(new_state.params)
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(p0, p1))


class TestSoundBank:
    def test_fifo_single_source(self):
        bank = init_bank(3, 2, 4)
        items = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
        # sample 0: single source class 1; sample 1: multi-source (skip)
        labels = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.int32)
        bank = update_bank(bank, items, labels)
        np.testing.assert_array_equal(np.asarray(bank[1, 1]),
                                      np.asarray(items[0]))
        assert np.all(np.asarray(bank[2]) == 0)  # multi-source not queued

    def test_fifo_shifts(self):
        bank = init_bank(2, 2, 1)
        labels = jnp.asarray([[0, 1]], jnp.int32)
        bank = update_bank(bank, jnp.asarray([[1.0]]), labels)
        bank = update_bank(bank, jnp.asarray([[2.0]]), labels)
        bank = update_bank(bank, jnp.asarray([[3.0]]), labels)
        np.testing.assert_array_equal(np.asarray(bank[1, :, 0]), [2.0, 3.0])

    def test_per_label_variant(self):
        bank = init_bank(4, 2, 1)
        labels = jnp.asarray([[1, 1, 0, 1]], jnp.int32)
        bank = update_bank(bank, jnp.asarray([[5.0]]), labels, per_label=True)
        assert float(bank[1, 1, 0]) == 5.0
        assert float(bank[3, 1, 0]) == 5.0
        assert float(bank[2, 1, 0]) == 0.0
        assert float(bank[0, 1, 0]) == 0.0  # background never queued

    @pytest.mark.parametrize("per_label", [False, True])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vectorized_matches_sequential_oracle(self, per_label, seed):
        """The scatter-free one-hot-matmul update must reproduce the
        sequential reference FIFO exactly (incl. multi-source skips,
        bg-only rows and >1 enqueue per class per batch)."""
        from cavp_tpu.models.soundbank import _update_bank_loop

        rng = np.random.RandomState(seed)
        C, N, D, B = 6, 3, 5, 12
        bank = jnp.asarray(rng.randn(C, N, D).astype(np.float32))
        items = jnp.asarray(rng.randn(B, D).astype(np.float32))
        # labels mixing bg-only, single-source (duplicated classes so one
        # batch enqueues several items into the same row) and multi-source
        labels = np.zeros((B, C), np.int32)
        labels[:, 0] = 1
        for i in range(B):
            k = rng.randint(0, 4)  # 0 = bg-only
            for c in rng.choice(np.arange(1, C), size=k, replace=False):
                labels[i, c] = 1
        labels = jnp.asarray(labels)
        got = update_bank(bank, items, labels, per_label=per_label)
        want = _update_bank_loop(bank, items, labels, per_label=per_label)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_vectorized_overflow_keeps_newest(self):
        """More enqueues than bank_size in one batch keeps the newest N."""
        bank = init_bank(2, 2, 1)
        labels = jnp.asarray([[0, 1]] * 3, jnp.int32)
        items = jnp.asarray([[1.0], [2.0], [3.0]])
        got = update_bank(bank, items, labels)
        np.testing.assert_array_equal(np.asarray(got[1, :, 0]), [2.0, 3.0])

    def test_overwrite_miss_match_counts(self):
        key = jax.random.PRNGKey(0)
        B = 8
        img_label = np.zeros((B, 5), np.int32)
        img_label[:, 0] = 1
        for i in range(B):
            img_label[i, 1 + i % 4] = 1
        if_match = jnp.asarray([False] * 6 + [True] * 2)
        res = overwrite_miss_match(
            key, if_match, jnp.asarray(img_label), jnp.asarray(img_label),
            ow_rate=0.5, enabled=True)
        # floor(6 * 0.5) = 3 selected (all single-source here)
        assert int(jnp.sum(res.change_mask)) == 3
        assert int(jnp.sum(res.if_match)) == 5
        # disabled -> no change
        res2 = overwrite_miss_match(
            key, if_match, jnp.asarray(img_label), jnp.asarray(img_label),
            ow_rate=0.5, enabled=False)
        assert int(jnp.sum(res2.change_mask)) == 0
