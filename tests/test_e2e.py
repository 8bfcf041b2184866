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


class TestAudioDecisiveFixture:
    """The generalize-smoke fixture options (scripts/generalize_smoke.py):
    ambiguous tints make the class decidable only from audio; vary_pos
    breaks position memorization. Both opt-in (default fixtures
    unchanged)."""

    def test_ambiguous_tints_pair_classes(self, tmp_path):
        import numpy as np
        from PIL import Image

        base = make_synthetic_avss(str(tmp_path), num_videos=6,
                                   image_size=48, num_classes=7,
                                   ambiguous=True, splits=("train",))
        # videos v=0..5 -> classes 1..6; tints key the pair (1,2),(3,4),(5,6)
        def mean_tint(v):
            vdir = [d for s in ("v1s", "v1m", "v2")
                    for d in [os.path.join(base, s, f"train_vid{v}")]
                    if os.path.isdir(d)][0]
            img = np.asarray(Image.open(
                os.path.join(vdir, "frames", "0.jpg")))
            mask = np.asarray(Image.open(
                os.path.join(vdir, "labels_semantic", "0.png")))
            return img[mask > 0].mean(0), mask[mask > 0].max()

        tints = {}
        for v in range(6):
            t, cls = mean_tint(v)
            tints[int(cls)] = t
        # same pair -> close tints; different pair -> far
        assert np.abs(tints[1] - tints[2]).max() < 12
        assert np.abs(tints[3] - tints[4]).max() < 12
        assert np.abs(tints[1] - tints[3]).max() > 25

    def test_vary_pos_moves_the_square(self, tmp_path):
        import numpy as np
        from PIL import Image

        base = make_synthetic_avss(str(tmp_path), num_videos=8,
                                   image_size=48, num_classes=7,
                                   vary_pos=True, splits=("train",))
        coords = set()
        for v in range(8):
            vdir = [d for s in ("v1s", "v1m", "v2")
                    for d in [os.path.join(base, s, f"train_vid{v}")]
                    if os.path.isdir(d)][0]
            mask = np.asarray(Image.open(
                os.path.join(vdir, "labels_semantic", "0.png")))
            ys, xs = np.nonzero(mask)
            assert ys.size > 0
            coords.add((int(ys.min()), int(xs.min())))
        assert len(coords) >= 4, f"positions did not vary: {coords}"
