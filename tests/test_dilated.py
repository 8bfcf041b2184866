"""Exactness + gating tests for the dilated-conv tap decomposition
(cavp_tpu/ops/dilated.py) and its Conv fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavp_tpu.models.layers import Conv
from cavp_tpu.ops import dilated


def _conv_ref(x, w, d):
    dh, dw = d
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((dh, dh), (dw, dw)),
        rhs_dilation=(dh, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (H, W, Cin, Cout, dilation) — the real model shapes (channel-thinned)
    (14, 14, 64, 48, (2, 2)),
    (14, 14, 64, 48, (4, 4)),
    (14, 14, 64, 48, (8, 8)),
    (14, 14, 96, 32, (6, 6)),
    (14, 14, 96, 32, (12, 12)),   # taps overlap only 2 of 14 positions
    (14, 14, 96, 32, (18, 18)),   # off-center taps fully out of bounds
    (32, 32, 48, 48, (12, 12)),   # 512-squared config map size
    (9, 13, 24, 16, (3, 5)),      # non-square map, anisotropic dilation
]


@pytest.mark.parametrize("h,w,ci,co,d", CASES)
def test_taps_match_conv_f32(h, w, ci, co, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    a = np.asarray(_conv_ref(x, k, d))
    b = np.asarray(dilated.conv3x3_dilated_taps(x, k, d))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_taps_match_conv_grad():
    """Backward through the decomposition equals the conv backward."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 14, 14, 32), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 32, 24) * 0.1, jnp.float32)
    d = (8, 8)
    cot = jnp.asarray(rng.randn(2, 14, 14, 24), jnp.float32)

    def loss(fn, x, k):
        return jnp.sum(fn(x, k, d) * cot)

    ga = jax.grad(lambda x, k: loss(_conv_ref, x, k), argnums=(0, 1))(x, k)
    gb = jax.grad(lambda x, k: loss(dilated.conv3x3_dilated_taps, x, k),
                  argnums=(0, 1))(x, k)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_useful_fraction_and_gate():
    # rate 18 at 14x14: only the center tap is in bounds
    assert dilated.useful_fraction(14, 14, 18, 18) == pytest.approx(1 / 9)
    # dilation 1 never decomposes; dilation 2 at 14 (0.82) does
    assert not dilated.should_decompose(14, 14, (1, 1))
    assert dilated.should_decompose(14, 14, (2, 2))
    # large map, small dilation: dense conv wins, no decomposition
    assert not dilated.should_decompose(224, 224, (2, 2))


def test_conv_module_uses_decomposition(monkeypatch):
    """The Conv fast path produces the same values as the plain conv
    lowering for a gated shape, bias included."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 14, 14, 16), jnp.float32)
    m = Conv(12, 3, strides=1, padding=6, dilation=6, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), x)
    fast = m.apply(v, x)
    monkeypatch.setattr(dilated, "ENABLED", False)
    ref = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flag_controls_global_gate():
    """--no_dilated_taps -> config.dilated_taps=False -> build_model
    flips ops.dilated.ENABLED (trace-time gate)."""
    from cavp_tpu.config import get_config, load_args_and_config
    from cavp_tpu.engine.runner import build_model

    prev = dilated.ENABLED
    try:
        cfg = load_args_and_config(["--setup", "avss", "--no_dilated_taps"])
        assert cfg.dilated_taps is False
        build_model(cfg)
        assert dilated.ENABLED is False
        build_model(get_config("avss"))
        assert dilated.ENABLED is True
    finally:
        dilated.ENABLED = prev


def test_eval_step_metrics_match_taps_on_off():
    """Full eval step produces the same metric sums with the
    decomposition on and off (48-square input: layer4 runs at 3x3 where
    every dilated conv takes the fast path)."""
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model

    cfg = get_config("avss").replace(
        image_width=48, image_height=48, num_classes=6,
        compute_dtype="float32", visual_backbone=18)
    model = build_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_eval_batch(cfg, 4).items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 48, 48, 3)),
                           jnp.zeros((1, 96, 64, 1)), eval_mode=True)

    prev = dilated.ENABLED
    try:
        outs = {}
        for enabled in (True, False):
            dilated.ENABLED = enabled
            step = jax.jit(make_eval_step(model, cfg))
            m = step(variables, eval_metrics_init(cfg.num_classes), batch)
            outs[enabled] = jax.tree_util.tree_map(np.asarray, m)
    finally:
        dilated.ENABLED = prev
    for a, b in zip(jax.tree_util.tree_leaves(outs[True]),
                    jax.tree_util.tree_leaves(outs[False])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h", [14, 64])
def test_aspp_merged_centers_match_plain(h):
    """ASPP with the merged-center matmul (or per-branch fallback at
    large maps) equals the plain-conv lowering; param paths unchanged."""
    from cavp_tpu.models.deeplabv3p import ASPP

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, h, h, 32), jnp.float32)
    m = ASPP(out_channels=24, hidden_channels=16)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    params = v["params"]
    assert params["map_conv0"]["kernel"].shape == (1, 1, 32, 16)
    for i in (1, 2, 3):
        assert params[f"map_conv{i}"]["kernel"].shape == (3, 3, 32, 16)

    prev = dilated.ENABLED
    try:
        dilated.ENABLED = True
        fast = m.apply(v, x, train=False)
        dilated.ENABLED = False
        ref = m.apply(v, x, train=False)
    finally:
        dilated.ENABLED = prev
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_conv_module_gate_skips_padding_mismatch(monkeypatch):
    """padding != dilation (not a 'same'-style dilated conv) must take
    the plain conv path — the rewrite assumes padding == dilation."""
    calls = []
    orig = dilated.conv3x3_dilated_taps

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dilated, "conv3x3_dilated_taps", spy)
    x = jnp.zeros((1, 14, 14, 8), jnp.float32)
    m = Conv(8, 3, strides=1, padding=1, dilation=6, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    m.apply(v, x)
    assert not calls
    m2 = Conv(8, 3, strides=1, padding=6, dilation=6, use_bias=False)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    m2.apply(v2, x)
    assert calls
