"""VPO dataset tests over a synthetic COCO/VGGSound-layout tree."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from cavp_tpu.config import get_config
from cavp_tpu.data.synthetic import write_wav
from cavp_tpu.data.vpo import VPODataset, prepare_train_data


@pytest.fixture(scope="module")
def vpo_root():
    tmp = tempfile.mkdtemp(prefix="vpo_")
    cfg = get_config("vpo_ss")
    root = os.path.join(tmp, "audio_visual")
    vpo = os.path.join(root, "VPO/VPO-SS")
    audio_dir = os.path.join(root, "vggsound_bench/VGGSound/audios")
    os.makedirs(audio_dir, exist_ok=True)

    rng = np.random.RandomState(0)
    rows = []
    # two single-source samples (cat=17, dog=18) and one 2-source image
    specs = [
        (1, 11, "cat", 17, "wav_a", 0.3, "train", 1),
        (2, 22, "dog", 18, "wav_b", 0.7, "train", 1),
        (3, 33, "cat", 17, "wav_a", 0.2, "train", 1),
        (3, 34, "dog", 18, "wav_b", 0.8, "train", 1),
        (4, 44, "cat", 17, "wav_a", 0.5, "val", 1),
    ]
    for img_id, ann, cate, cid, wav, pos, split, mi in specs:
        rows.append(dict(img_Id=img_id, ann_Ids=ann, cateName=cate,
                         cateId=cid, vgg_file=wav, audio_pos=pos,
                         split=split, multi_instance=mi))
        img_n = str(img_id).zfill(12)
        mask_n = str(ann).zfill(12)
        img_dir = os.path.join(vpo, "data", cate)
        mask_dir = os.path.join(vpo, "mask", cate)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        img = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{img_n}.jpg"))
        mask = np.zeros((48, 48), np.uint8)
        mask[8:24, 8:24] = cid  # COCO id in the mask, remapped on load
        Image.fromarray(mask).save(
            os.path.join(mask_dir, f"{img_n}_{mask_n}.png"))
    for wav in ("wav_a", "wav_b"):
        t = np.linspace(0, 4, 64000, endpoint=False)
        write_wav(os.path.join(audio_dir, wav + ".wav"),
                  (0.3 * np.sin(2 * np.pi * 440 * t))[None].astype(np.float32))

    df = pd.DataFrame(rows)
    return root, df


class TestVPODataset:
    def _cfg(self, root):
        return get_config("vpo_ss").replace(
            root_dataset_dir=root, image_width=48, image_height=48)

    def test_single_source_stereo(self, vpo_root):
        root, df = vpo_root
        cfg = self._cfg(root)
        ds = VPODataset(cfg, "train", df, stereo=True, multi_source=False)
        assert len(ds) == 4  # train rows
        item = ds[0]
        assert item["image"].shape == (48, 48, 3)
        assert item["waveform"].shape == (2, int(16000 * 3.0))
        # COCO id 17 remapped to VPO index of "cat"
        cat_idx = cfg.index_table.index("cat")
        # 255 can appear from pad+crop augmentation fill
        assert set(np.unique(item["pix_label"])) <= {0, cat_idx, 255}
        assert item["img_label"][cat_idx] == 1

    def test_multi_source_groups_and_mixes(self, vpo_root):
        root, df = vpo_root
        cfg = self._cfg(root).replace(setup="vpo_ms")
        ds = VPODataset(cfg, "train", df, stereo=True, multi_source=True,
                        per_category_dir=True)
        # img_Ids 1, 2, 3 -> 3 groups
        assert len(ds) == 3
        grouped = [g for g in ds.groups if len(g) == 2]
        assert len(grouped) == 1  # img_Id 3 has two sources
        item = ds[[i for i, g in enumerate(ds.groups)
                   if g.iloc[0]["img_Id"] == 3][0]]
        # mixture of two panned sources; both channels nonzero
        assert np.abs(item["waveform"][0]).sum() > 0
        assert np.abs(item["waveform"][1]).sum() > 0

    def test_mono(self, vpo_root):
        root, df = vpo_root
        cfg = self._cfg(root)
        ds = VPODataset(cfg, "train", df, stereo=False, multi_source=False)
        item = ds[0]
        assert item["waveform"].shape == (1, int(16000 * 3.0))

    def test_val_maps_to_test(self, vpo_root):
        root, df = vpo_root
        cfg = self._cfg(root)
        ds = VPODataset(cfg, "test", df, stereo=True, multi_source=False)
        assert len(ds) == 1  # the val row (split renamed to test)


class TestVPOEndToEnd:
    def test_runner_train_and_validate_stereo(self, vpo_root):
        """Full runner E2E on the VPO fixture (mirrors main_vpo_stereo):
        stereo panning + per-frame eval with collate_eval_frames."""
        import tempfile

        import jax
        import numpy as np

        from cavp_tpu.data.pipeline import (collate_eval_frames,
                                            collate_train_frames)
        from cavp_tpu.engine.runner import run_training

        root, df = vpo_root
        cfg = get_config("vpo_ss").replace(
            root_dataset_dir=root, image_width=48, image_height=48,
            batch_size=2, epochs=1, num_workers=2, max_view=8,
            class_slots=2, compute_dtype="float32", visual_backbone=18,
            in_plane=2, ignore_ckpt=True, resize_flag=True)

        def make_datasets(config):
            train = VPODataset(config, "train", df, stereo=True,
                               multi_source=False)
            test = VPODataset(config, "test", df, stereo=True,
                              multi_source=False)
            return train, test, collate_train_frames

        state, best = run_training(
            cfg, "vpo_stereo", make_datasets,
            ckpt_dir=tempfile.mkdtemp(), max_steps_per_epoch=2,
            eval_collate=collate_eval_frames, eval_batch_size=2)
        assert np.isfinite(best)
        assert int(state.step) == 2
