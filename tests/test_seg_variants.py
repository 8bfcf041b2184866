"""CAVP assemblies with the secondary seg models (HRNet / OCR / PVT)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.models import CAVP, LATENT_DIM


@pytest.mark.parametrize("seg_model", ["HRNet", "OCR", "PVT"])
def test_cavp_variant_forward(seg_model):
    model = CAVP(num_classes=5, seg_model=seg_model, visual_backbone=50)
    image = jnp.zeros((1, 64, 64, 3))
    audio = jnp.zeros((1, 96, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), image, audio,
                           eval_mode=True)
    logits, fused, pack = model.apply(variables, image, audio,
                                      eval_mode=True)
    assert logits.shape == (1, 64, 64, 5)
    assert fused.shape[-1] == LATENT_DIM[seg_model]
    assert pack["audio"].shape == (1, LATENT_DIM[seg_model])
    assert np.isfinite(np.asarray(logits)).all()
