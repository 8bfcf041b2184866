"""Exactness of the train-path audio-tower dedup (engine/loops.py).

The avss trainer (trainer_cavp_avss_image.py:66-76,186-198) runs the
audio tower on the concatenated 2B clip batch (matched ‖ shuffled/bank-
overwritten). The VGG tower has no BatchNorm — per-clip pure — so the
shuffled half's features are a gather of the matched half's except for
the <= floor(B*ow_rate) bank-overwritten rows. The dedup path runs the
tower on B + floor(B*ow_rate) clips and gathers.

These tests pin the *whole train step* (loss, gradients -> updated
params, batch stats, sound bank) equal between dedup on and off, with
the overwrite path genuinely exercised (mismatched pairs + prefilled
bank + epoch >= 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.engine.loops import make_train_step
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import create_train_state
from cavp_tpu.models import CAVP


def tiny_config(**kw):
    cfg = get_config("avss")
    return cfg.replace(
        num_classes=5, batch_size=6, image_width=64, image_height=64,
        max_view=8, class_slots=3, epochs=2, compute_dtype="float32", **kw)


def tiny_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B = cfg.batch_size
    img = rng.randn(B, 64, 64, 3).astype(np.float32)
    wave = (rng.rand(B, 1, cfg.audio_samples).astype(np.float32) - 0.5)
    pix = rng.randint(0, cfg.num_classes, (B, 64, 64)).astype(np.int32)
    # single-source rows with distinct classes -> the random permutation
    # produces mismatched pairs for overwrite_miss_match to convert
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


@pytest.fixture(scope="module")
def harness():
    cfg = tiny_config()
    model = CAVP(num_classes=cfg.num_classes, visual_backbone=18,
                 audio_backbone="vgg")
    tx, _ = make_optimizer(cfg.replace(lr=1e-2))
    batch = tiny_batch(cfg)
    sample = {"image": batch["image"][:1],
              "audio": jnp.zeros((1, 96, 64, 1))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample, cfg)
    # prefill the bank so overwritten rows pull a *different* waveform
    bank = np.random.RandomState(7).randn(
        *np.shape(state.sound_bank)).astype(np.float32) * 0.1
    state = state.replace(sound_bank=jnp.asarray(bank))
    return cfg, model, tx, state, batch


def _run(cfg, model, tx, state, batch, epoch):
    step = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3),
                              jnp.asarray(epoch))
    return jax.device_get(
        (new_state.params, new_state.batch_stats, new_state.sound_bank,
         metrics))


def _assert_tree_close(a, b, atol):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    for (path, xa), xb in zip(fa, fb):
        np.testing.assert_allclose(
            xa, xb, rtol=0, atol=atol,
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("epoch", [0, 1])
def test_step_equivalence(harness, epoch):
    """Full step with dedup on vs off. epoch=1 exercises the
    bank-overwrite slots; epoch=0 the pure-permutation (K slots unused)
    path.

    The *forward* is exact: loss, batch stats and sound bank must be
    bitwise equal (the gathered features are the same rows). The audio
    tower's *weight gradients* are a reassociated sum — the 2B path
    backprops each duplicate clip separately and sums in dW, the dedup
    path sums the duplicates' cotangents at the feature gather first —
    identical by linearity of differentiation but not bitwise in fp
    (measured ~1.6e-5 after one lr=1e-2 SGD step), hence the params
    tolerance."""
    cfg, model, tx, state, batch = harness
    p_on, bs_on, bank_on, m_on = _run(
        cfg.replace(audio_dedup=True), model, tx, state, batch, epoch)
    p_off, bs_off, bank_off, m_off = _run(
        cfg.replace(audio_dedup=False), model, tx, state, batch, epoch)

    assert float(m_on["loss/loss"]) == float(m_off["loss/loss"]), (
        m_on["loss/loss"], m_off["loss/loss"])
    _assert_tree_close(bs_on, bs_off, atol=0)
    np.testing.assert_allclose(bank_on, bank_off, rtol=0, atol=0)
    _assert_tree_close(p_on, p_off, atol=1e-4)


def test_overwrite_actually_exercised(harness):
    """Sanity: at epoch>=1 the fixture genuinely converts some
    mismatched pairs (otherwise the K>0 leg of the dedup is untested)."""
    cfg, model, tx, state, batch = harness
    from cavp_tpu.models.soundbank import overwrite_miss_match

    # reproduce the step's RNG stream (loops.py: fold_in(rng, step) -> 4)
    k_shuffle, k_ow, _, _ = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(3), int(state.step)), 4)
    B = cfg.batch_size
    shuffle_idx = jax.random.permutation(k_shuffle, B)
    img_label = batch["img_label"]
    shuffle_img_label = img_label[shuffle_idx]
    if_match = jnp.all(img_label == shuffle_img_label, axis=1)
    ow = overwrite_miss_match(k_ow, if_match, shuffle_img_label, img_label,
                              cfg.ow_rate, enabled=True)
    n_changed = int(jnp.sum(ow.change_mask))
    assert n_changed >= 1
    assert n_changed <= int(B * cfg.ow_rate)
