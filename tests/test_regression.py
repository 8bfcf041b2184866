"""Golden regression: seeded tiny-model forward statistics pinned so
behavior drift across rounds is caught (complements the parity tests —
these detect *unintentional* changes to any piece of the stack)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.audio.mel import preprocess_audio, vggish_log_mel
from cavp_tpu.models import CAVP

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "goldens.json")


def _compute_goldens():
    out = {}
    rng = np.random.RandomState(1234)

    wave = jnp.asarray((rng.rand(2, 16000).astype(np.float32) - 0.5) * 0.5)
    mel = preprocess_audio(wave[:, None, :], n_frames=96)
    out["trainer_mel_mean"] = float(jnp.mean(mel))
    out["trainer_mel_std"] = float(jnp.std(mel))

    vgg = vggish_log_mel(wave[0])
    out["vggish_mel_mean"] = float(jnp.mean(vgg))

    model = CAVP(num_classes=5, visual_backbone=18)
    image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    audio = jnp.asarray(rng.randn(1, 96, 64, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(7), image, audio,
                           eval_mode=True)
    logits, fused, pack = model.apply(variables, image, audio,
                                      eval_mode=True)
    out["cavp_logits_mean"] = float(jnp.mean(logits.astype(jnp.float32)))
    out["cavp_logits_std"] = float(jnp.std(logits.astype(jnp.float32)))
    out["cavp_fused_mean"] = float(jnp.mean(fused.astype(jnp.float32)))
    out["cavp_attn_mean"] = float(jnp.mean(pack["attn_v"].astype(jnp.float32)))
    return out


class TestGoldenRegression:
    def test_against_recorded_goldens(self):
        got = _compute_goldens()
        if not os.path.exists(GOLDEN_FILE):
            with open(GOLDEN_FILE, "w") as f:
                json.dump(got, f, indent=2, sort_keys=True)
            pytest.skip("goldens recorded; rerun to compare")
        with open(GOLDEN_FILE) as f:
            expected = json.load(f)
        for k, v in expected.items():
            assert k in got
            np.testing.assert_allclose(got[k], v, rtol=2e-3, atol=1e-5,
                                       err_msg=k)
