"""Train-step variants: vpo_stereo (label-only overwrite, 2-ch audio,
3 s mel) and vpo_mono (per-sample bank) compile and update; resume
restores full state."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.data.synthetic import synthetic_train_batch
from cavp_tpu.engine.loops import make_train_step
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import create_train_state


def _tiny_vpo(stereo: bool):
    cfg = get_config("vpo_ss").replace(
        num_classes=5, batch_size=4, image_width=64, image_height=64,
        max_view=8, class_slots=2, compute_dtype="float32",
        visual_backbone=18, in_plane=2 if stereo else 1)
    from cavp_tpu.engine.runner import build_model

    model = build_model(cfg)
    tx, _ = make_optimizer(cfg.replace(lr=1e-3), 10)
    sample = {"image": jnp.zeros((1, 64, 64, 3)),
              "audio": jnp.zeros((1, 300, 64, cfg.in_plane))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_train_batch(cfg).items()}
    return cfg, model, tx, state, batch


class TestVPOVariants:
    def test_stereo_step(self):
        cfg, model, tx, state, batch = _tiny_vpo(stereo=True)
        step = jax.jit(make_train_step(model, tx, cfg, variant="vpo_stereo"))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                                  jnp.asarray(1))
        assert np.isfinite(float(metrics["loss/loss"]))
        # stereo variant never touches the waveform bank
        np.testing.assert_array_equal(np.asarray(new_state.sound_bank),
                                      np.asarray(state.sound_bank))

    def test_mono_step_updates_bank(self):
        cfg, model, tx, state, batch = _tiny_vpo(stereo=False)
        step = jax.jit(make_train_step(model, tx, cfg, variant="vpo_mono"))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                                  jnp.asarray(1))
        assert np.isfinite(float(metrics["loss/loss"]))
        assert not np.allclose(np.asarray(new_state.sound_bank),
                               np.asarray(state.sound_bank))


class TestResume:
    def test_orbax_resume_restores_step_and_params(self):
        from cavp_tpu.engine.checkpoint import save_checkpoint
        from cavp_tpu.engine.runner import _restore_into_state
        from cavp_tpu.parallel import create_mesh

        cfg, model, tx, state, batch = _tiny_vpo(stereo=False)
        step = jax.jit(make_train_step(model, tx, cfg, variant="vpo_mono"))
        trained, _ = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(0))
        path = save_checkpoint(
            os.path.join(tempfile.mkdtemp(), "resume_ck"), trained)

        fresh = state  # pre-training state
        mesh = create_mesh(num_devices=1)
        restored, _ = _restore_into_state(fresh, path, mesh)
        assert int(restored.step) == int(trained.step)
        a = jax.tree_util.tree_leaves(trained.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
