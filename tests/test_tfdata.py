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
