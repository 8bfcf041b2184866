"""End-to-end: synthetic on-disk AVSS dataset -> runner training loop ->
validation metrics (SURVEY.md §4f, on fixtures)."""

import os
import tempfile

import numpy as np
import pytest

from cavp_tpu.config import get_config
from cavp_tpu.data.avss import AVSSDataset
from cavp_tpu.data.pipeline import DataLoader, collate_eval_videos
from cavp_tpu.data.synthetic import make_synthetic_avss


@pytest.fixture(scope="module")
def synthetic_root():
    tmp = tempfile.mkdtemp(prefix="cavp_e2e_")
    base = make_synthetic_avss(tmp, num_videos=4, image_size=48,
                               num_classes=6)
    return base


class TestEndToEnd:
    def test_train_and_validate(self, synthetic_root):
        from cavp_tpu.engine.runner import run_training

        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=6, batch_size=2,
            epochs=1, max_view=8, class_slots=2, num_workers=2,
            compute_dtype="float32", visual_backbone=18, ignore_ckpt=True)

        def make_datasets(config):
            from cavp_tpu.data.pipeline import collate_train_videos

            train = AVSSDataset(config, "train", dir_base=synthetic_root)
            test = AVSSDataset(config, "test", dir_base=synthetic_root)
            return train, test, collate_train_videos

        state, best = run_training(cfg, "avss", make_datasets,
                                   ckpt_dir=tempfile.mkdtemp(),
                                   max_steps_per_epoch=2)
        assert np.isfinite(best)
        assert int(state.step) == 2

    def test_jf_path(self, synthetic_root):
        """J&F test step over the synthetic videos (binary collapse)."""
        import jax
        import jax.numpy as jnp

        from cavp_tpu.data.pipeline import flatten_video_batch
        from cavp_tpu.engine.loops import make_jf_test_step
        from cavp_tpu.engine.runner import build_model

        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=2, batch_size=1,
            compute_dtype="float32", visual_backbone=18, resize_flag=True,
            avsbench_split="v1m")
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 48, 48, 3)),
                               jnp.zeros((1, 96, 64, 1)))
        ds = AVSSDataset(cfg, "test", dir_base=synthetic_root)
        loader = DataLoader(ds, 1, collate_eval_videos, num_workers=1)
        jf_step = jax.jit(make_jf_test_step(model, cfg))
        for batch in loader:
            batch.pop("name"), batch.pop("img_label")
            batch.pop("frame_available")
            flat = flatten_video_batch(batch)
            miou, fscore = jf_step(variables, flat)
            assert np.isfinite(float(miou)) and np.isfinite(float(fscore))
            break
