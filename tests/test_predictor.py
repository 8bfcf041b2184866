"""Serving Predictor: bucketing, padding, chunking, numpy I/O."""

import numpy as np

from cavp_tpu.config import get_config
from cavp_tpu.engine.predictor import Predictor


class TestPredictor:
    def test_predict_chunks_and_shapes(self):
        cfg = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            compute_dtype="float32", visual_backbone=18)
        p = Predictor(cfg, batch_sizes=(2, 4), return_probs=True).warmup()
        rng = np.random.RandomState(0)
        images = rng.randint(0, 255, (5, 64, 64, 3), np.uint8)
        waves = (rng.rand(5, 1, cfg.audio_samples).astype(np.float32) - 0.5)
        out = p.predict(images, waves)
        assert out["mask"].shape == (5, 64, 64)
        assert out["mask"].dtype == np.int32
        assert out["probs"].shape == (5, 64, 64, 5)
        np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-4)
        # padding must not change the result of a smaller direct call
        out2 = p.predict(images[:2], waves[:2])
        np.testing.assert_array_equal(out["mask"][:2], out2["mask"])
        # off-config shapes are rejected, never recompiled
        import pytest
        with pytest.raises(ValueError, match="compiled"):
            p.predict(images[:, :32, :32], waves)
        with pytest.raises(ValueError, match="compiled"):
            p.predict(images, waves[..., :100])

    def test_checkpoint_load_uses_eval_shape_templates(self, tmp_path):
        """With a checkpoint, Predictor must serve the checkpoint's
        weights (init is skipped for zero-template eval_shape)."""
        import jax

        from cavp_tpu.engine.checkpoint import save_checkpoint
        from cavp_tpu.engine.state import TrainState

        cfg = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            compute_dtype="float32", visual_backbone=18)
        ref = Predictor(cfg, batch_sizes=(2,))  # random-init reference
        state = TrainState(step=jax.numpy.asarray(3),
                           params=ref.variables["params"],
                           batch_stats=ref.variables["batch_stats"],
                           opt_state={}, sound_bank=None)
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, state)

        p = Predictor(cfg, ckpt_path=ck, batch_sizes=(2,))
        # served params are the checkpoint's, not zeros or a fresh init
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(p.variables["params"])[0]),
            np.asarray(jax.tree_util.tree_leaves(ref.variables["params"])[0]))

        rng = np.random.RandomState(3)
        images = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
        waves = (rng.rand(2, 1, cfg.audio_samples).astype(np.float32) - 0.5)
        np.testing.assert_array_equal(p.predict(images, waves)["mask"],
                                      ref.predict(images, waves)["mask"])
