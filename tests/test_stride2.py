"""Exactness + gating tests for the phase-decomposed stride-2 backward
(cavp_tpu/ops/stride2.py) and its opt-in Conv fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavp_tpu.models.layers import Conv
from cavp_tpu.ops import stride2


def _plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (B, H, W, Cin, Cout) — channel-thinned versions of the tower's
    # stride-2 3x3 convs (stem conv1, layer2/3 first-block conv2)
    (2, 16, 16, 8, 12),
    (3, 56, 56, 16, 16),
    (2, 28, 20, 24, 8),   # non-square
    (1, 4, 4, 3, 5),      # tiny: every edge case adjacent
]


@pytest.mark.parametrize("b,h,w,ci,co", CASES)
def test_forward_identical(b, h, w, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    np.testing.assert_array_equal(np.asarray(_plain(x, k)),
                                  np.asarray(stride2.conv3x3_s2(x, k)))


@pytest.mark.parametrize("b,h,w,ci,co", CASES)
def test_vjp_matches_default(b, h, w, ci, co):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.randn(b, h // 2, w // 2, co), jnp.float32)

    def loss(fn, x, k):
        return jnp.sum(fn(x, k) * cot)

    ga = jax.grad(lambda x, k: loss(_plain, x, k), argnums=(0, 1))(x, k)
    gb = jax.grad(lambda x, k: loss(stride2.conv3x3_s2, x, k),
                  argnums=(0, 1))(x, k)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_phase_grad_input_direct():
    """phase_grad_input alone vs the transposed-conv input gradient."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 12, 10, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 9) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.randn(2, 6, 5, 9), jnp.float32)
    ref = jax.vjp(lambda xx: _plain(xx, k), x)[1](cot)[0]
    got = stride2.phase_grad_input(cot, k)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-5)


def _plain_1x1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,h,w,ci,co", [(2, 16, 16, 8, 12),
                                         (2, 28, 20, 24, 8)])
def test_1x1_forward_and_vjp(b, h, w, ci, co):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(b, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, ci, co) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.randn(b, h // 2, w // 2, co), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_plain_1x1(x, k)),
                                  np.asarray(stride2.conv1x1_s2(x, k)))

    def loss(fn, x, k):
        return jnp.sum(fn(x, k) * cot)

    ga = jax.grad(lambda x, k: loss(_plain_1x1, x, k), argnums=(0, 1))(x, k)
    gb = jax.grad(lambda x, k: loss(stride2.conv1x1_s2, x, k),
                  argnums=(0, 1))(x, k)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_gate_requires_even_and_exact_shape():
    assert not stride2.applicable((3, 3), (2, 2), (1, 1), (1, 1), 1, 15, 16) or not stride2.ENABLED
    prev = stride2.ENABLED
    try:
        stride2.ENABLED = True
        assert stride2.applicable((3, 3), (2, 2), (1, 1), (1, 1), 1, 56, 56)
        assert not stride2.applicable((3, 3), (2, 2), (1, 1), (1, 1), 1, 55, 56)
        assert not stride2.applicable((3, 3), (1, 1), (1, 1), (1, 1), 1, 56, 56)
        assert not stride2.applicable((3, 3), (2, 2), (0, 0), (1, 1), 1, 56, 56)
        assert not stride2.applicable((1, 1), (2, 2), (1, 1), (1, 1), 1, 56, 56)
        assert not stride2.applicable((3, 3), (2, 2), (1, 1), (2, 2), 1, 56, 56)
        assert not stride2.applicable((3, 3), (2, 2), (1, 1), (1, 1), 2, 56, 56)
        assert stride2.applicable_1x1((1, 1), (2, 2), (0, 0), (1, 1), 1, 56, 56)
        assert not stride2.applicable_1x1((1, 1), (1, 1), (0, 0), (1, 1), 1, 56, 56)
        assert not stride2.applicable_1x1((1, 1), (2, 2), (1, 1), (1, 1), 1, 56, 56)
        assert not stride2.applicable_1x1((1, 1), (2, 2), (0, 0), (1, 1), 1, 55, 56)
    finally:
        stride2.ENABLED = prev


def test_conv_module_grads_match_with_gate(monkeypatch):
    """Grad through the Conv module is unchanged when the opt-in fast
    path engages (values + grads, bias included)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    m = Conv(12, 3, strides=2, padding=1, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(jnp.square(m.apply(v, x)))

    monkeypatch.setattr(stride2, "ENABLED", True)
    fast_val, fast_grad = jax.value_and_grad(loss)(v, x)
    monkeypatch.setattr(stride2, "ENABLED", False)
    ref_val, ref_grad = jax.value_and_grad(loss)(v, x)
    np.testing.assert_allclose(float(fast_val), float(ref_val),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(fast_grad),
                    jax.tree_util.tree_leaves(ref_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_flag_controls_global_gate():
    """--s2_phase_bwd -> config.s2_phase_bwd=True -> build_model flips
    ops.stride2.ENABLED (trace-time gate, default off)."""
    from cavp_tpu.config import get_config, load_args_and_config
    from cavp_tpu.engine.runner import build_model

    prev = stride2.ENABLED
    try:
        cfg = load_args_and_config(["--setup", "avss", "--s2_phase_bwd"])
        assert cfg.s2_phase_bwd is True
        build_model(cfg)
        assert stride2.ENABLED is True
        build_model(get_config("avss"))
        assert stride2.ENABLED is False
    finally:
        stride2.ENABLED = prev


def test_train_step_loss_matches_s2_on_off():
    """One full train step (64-square, resnet18 — stem conv1 and the
    layer2/3 stride-2 conv2 all take the phase path) produces the same
    loss and updated params with the phase backward on and off."""
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.state import create_train_state
    from cavp_tpu.models import CAVP

    cfg = get_config("avss").replace(
        num_classes=5, batch_size=2, image_width=64, image_height=64,
        max_view=8, class_slots=3, compute_dtype="float32")
    rng = np.random.RandomState(7)
    B = 2
    batch = {
        "image": jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32),
        "waveform": jnp.asarray(
            rng.rand(B, 1, cfg.audio_samples) - 0.5, jnp.float32),
        "pix_label": jnp.asarray(
            rng.randint(0, cfg.num_classes, (B, 64, 64)), jnp.int32),
        "img_label": jnp.asarray(
            np.eye(cfg.num_classes, dtype=np.int32)[None, 0]
            .repeat(B, axis=0)),
    }
    model = CAVP(num_classes=cfg.num_classes, visual_backbone=18,
                 audio_backbone="vgg")
    tx, _ = make_optimizer(cfg)
    sample = {"image": batch["image"][:1],
              "audio": jnp.zeros((1, 96, 64, 1))}
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                                cfg)
    prev = stride2.ENABLED
    outs = {}
    try:
        for enabled in (True, False):
            stride2.ENABLED = enabled
            step = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
            st, metrics = step(state0, batch, jax.random.PRNGKey(42),
                               jnp.asarray(1))
            outs[enabled] = (float(metrics["loss/loss"]),
                             jax.tree_util.tree_map(np.asarray, st.params))
    finally:
        stride2.ENABLED = prev
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][1]),
                    jax.tree_util.tree_leaves(outs[False][1])):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
