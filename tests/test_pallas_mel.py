"""Fused Pallas log-mel vs the jnp reference path (interpret mode on the
CPU test mesh; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.audio.mel import preprocess_audio
from cavp_tpu.ops.pallas import mel_kernel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


class TestFusedMel:
    def test_matches_jnp_path(self):
        rng = np.random.RandomState(0)
        wave = (rng.rand(3, 16000).astype(np.float32) - 0.5) * 0.6
        fused = mel_kernel.fused_log_mel(jnp.asarray(wave), n_frames=96)
        ref = preprocess_audio(jnp.asarray(wave)[:, None, :], n_frames=96)
        np.testing.assert_allclose(np.asarray(fused),
                                   np.asarray(ref[:, 0]),
                                   rtol=2e-3, atol=2e-3)

    def test_row_padding(self):
        # N*n_frames not a multiple of the row tile
        rng = np.random.RandomState(1)
        wave = (rng.rand(1, 16000).astype(np.float32) - 0.5)
        fused = mel_kernel.fused_log_mel(jnp.asarray(wave), n_frames=96)
        assert fused.shape == (1, 96, 64)
        assert np.isfinite(np.asarray(fused)).all()
