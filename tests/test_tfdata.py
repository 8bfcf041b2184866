"""tf.data pipeline vs the thread-pool loader on the synthetic AVSS tree."""

import tempfile

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from cavp_tpu.config import get_config
from cavp_tpu.data.avss import AVSSDataset
from cavp_tpu.data.synthetic import make_synthetic_avss
from cavp_tpu.data.tfdata import (TfEvalLoader, avss_file_table,
                                  make_avss_eval_dataset)


class TestTFData:
    def test_eval_batches_match_shapes(self):
        tmp = tempfile.mkdtemp()
        base = make_synthetic_avss(tmp, num_videos=3, image_size=48,
                                   num_classes=6)
        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=6,
            resize_flag=True)
        ds = AVSSDataset(cfg, "test", dir_base=base)
        table = avss_file_table(ds)
        assert len(table) == 3
        it = make_avss_eval_dataset(table, cfg, batch_videos=2)
        batch = next(it)
        assert batch["image"].shape[1:] == (10, 48, 48, 3)
        assert batch["pix_label"].shape[1:] == (10, 48, 48)
        assert batch["waveform"].shape[1:] == (10, 1, 16000)
        assert batch["valid"].shape[1:] == (10,)
        assert np.isfinite(batch["image"]).all()

    def test_loader_is_reiterable(self):
        """TfEvalLoader (the --use_tfdata runner wiring) must support a
        fresh pass per validation gate."""
        tmp = tempfile.mkdtemp()
        base = make_synthetic_avss(tmp, num_videos=3, image_size=48,
                                   num_classes=6)
        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=6,
            resize_flag=True)
        ds = AVSSDataset(cfg, "test", dir_base=base)
        loader = TfEvalLoader(ds, cfg, batch_videos=2)
        assert len(loader) == 2
        for _ in range(2):  # two validation passes
            batches = list(loader)
            assert len(batches) == 2
            assert batches[0]["image"].shape[1:] == (10, 48, 48, 3)

    def test_palette_mask_indices_preserved(self):
        """Real AVSS labels are palette PNGs whose palette INDEX is the
        class id. tf.io.decode_png expands palettes to RGB (garbage
        labels); the pipeline must keep raw indices."""
        import os
        import tempfile

        import numpy as np
        from PIL import Image

        from cavp_tpu.data.avss import get_v2_palette
        from cavp_tpu.data.synthetic import make_synthetic_avss, write_wav

        tmp = tempfile.mkdtemp()
        base = make_synthetic_avss(tmp, num_videos=1, image_size=48,
                                   num_classes=6)
        # overwrite the v2 video's masks with palette-mode PNGs
        vdir = os.path.join(base, "v2", "test_vid2")
        if not os.path.isdir(vdir):  # ensure a v2 video exists
            vdir = None
            for sub in ("v1s", "v1m", "v2"):
                d = os.path.join(base, sub)
                if os.path.isdir(d):
                    vdir = os.path.join(d, sorted(os.listdir(d))[0])
                    break
        mask = np.zeros((48, 48), np.uint8)
        mask[10:30, 10:30] = 37  # class id far from its palette gray level
        pal_img = Image.fromarray(mask, mode="P")
        pal_img.putpalette(get_v2_palette(71))
        mdir = os.path.join(vdir, "labels_semantic")
        for f in os.listdir(mdir):
            pal_img.save(os.path.join(mdir, f))

        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=71,
            resize_flag=True)
        ds = AVSSDataset(cfg, "test", dir_base=base)
        table = avss_file_table(ds)
        batch = next(make_avss_eval_dataset(table[:1], cfg, batch_videos=1))
        labels = np.unique(batch["pix_label"])
        assert 37 in labels, labels  # raw palette index survived
        assert labels.max() <= 70, labels  # no RGB/gray expansion

    def test_runner_validation_via_tfdata(self):
        """run_training with use_tfdata=True swaps the eval loader for
        the tf.data pipeline and still produces finite metrics."""
        import tempfile

        import numpy as np

        from cavp_tpu.data.pipeline import collate_train_videos
        from cavp_tpu.engine.runner import run_training

        base = make_synthetic_avss(tempfile.mkdtemp(), num_videos=4,
                                   image_size=48, num_classes=6)
        cfg = get_config("avss").replace(
            image_width=48, image_height=48, num_classes=6, batch_size=2,
            epochs=1, max_view=8, class_slots=2, num_workers=2,
            compute_dtype="float32", visual_backbone=18, ignore_ckpt=True,
            resize_flag=True, use_tfdata=True)

        def make_datasets(config):
            train = AVSSDataset(config, "train", dir_base=base)
            test = AVSSDataset(config, "test", dir_base=base)
            return train, test, collate_train_videos

        state, best = run_training(cfg, "avss", make_datasets,
                                   ckpt_dir=tempfile.mkdtemp(),
                                   max_steps_per_epoch=2)
        assert np.isfinite(best)
