"""S4/MS3 dataset tests over a synthetic avsbench_data tree."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from cavp_tpu.config import get_config
from cavp_tpu.data.avsbench import MS3Dataset, S4Dataset, ms3_paths, s4_paths
from cavp_tpu.data.synthetic import write_wav


def _tone(seconds=10.0, hz=440):
    t = np.linspace(0, seconds, int(16000 * seconds), endpoint=False)
    return (0.3 * np.sin(2 * np.pi * hz * t))[None].astype(np.float32)


@pytest.fixture(scope="module")
def s4_root():
    root = tempfile.mkdtemp(prefix="s4_")
    p = s4_paths(root)
    rows = ["name,split,category"]
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for v in range(2):
            name = f"{split}_v{v}"
            cat = "dog_barking"
            img_dir = os.path.join(p["dir_img"], split, cat, name)
            mask_dir = os.path.join(p["dir_mask"], split, cat, name)
            wav_dir = os.path.join(p["dir_wav"], split, cat)
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(mask_dir, exist_ok=True)
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(1, 6):
                img = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"{name}_{i}.png"))
                mask = np.zeros((48, 48), np.uint8)
                mask[10:30, 10:30] = 255
                Image.fromarray(mask).convert("1").save(
                    os.path.join(mask_dir, f"{name}_{i}.png"))
            write_wav(os.path.join(wav_dir, f"{name}.wav"), _tone())
            rows.append(f"{name},{split},{cat}")
    os.makedirs(os.path.dirname(p["anno_csv"]), exist_ok=True)
    with open(p["anno_csv"], "w") as f:
        f.write("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def ms3_root():
    root = tempfile.mkdtemp(prefix="ms3_")
    p = ms3_paths(root)
    rows = ["video_id,split"]
    rng = np.random.RandomState(1)
    for split in ("train", "test"):
        for v in range(2):
            name = f"{split}_m{v}"
            img_dir = os.path.join(p["dir_img"], name)
            mask_dir = os.path.join(p["dir_mask"], split, name)
            wav_dir = os.path.join(p["dir_wav"], split)
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(mask_dir, exist_ok=True)
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(1, 6):
                img = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"{name}.mp4_{i}.png"))
                mask = np.zeros((48, 48), np.uint8)
                mask[5:20, 5:20] = 255
                Image.fromarray(mask).convert("1").save(
                    os.path.join(mask_dir, f"{name}_{i}.png"))
            write_wav(os.path.join(wav_dir, f"{name}.wav"), _tone())
            rows.append(f"{name},{split}")
    os.makedirs(os.path.dirname(p["anno_csv"]), exist_ok=True)
    with open(p["anno_csv"], "w") as f:
        f.write("\n".join(rows) + "\n")
    return root


class TestS4:
    def test_train_item(self, s4_root):
        cfg = get_config("avss_binary").replace(
            data_root=s4_root, image_width=48, image_height=48,
            num_classes=2, setup="avss")
        ds = S4Dataset(cfg, "train")
        assert len(ds) == 2
        item = ds[0]
        assert item["image"].shape == (10, 48, 48, 3)
        assert item["pix_label"].shape == (10, 48, 48)
        assert set(np.unique(item["pix_label"])) <= {0, 1, 255}
        # 2 s window per frame slot (reference J&F test's
        # waveform.view(B, 5, 1, -1)); rows 5-9 are zero pads
        assert item["waveform"].shape == (10, 32000)
        assert np.abs(item["waveform"][5:]).max() == 0.0
        # train: only first mask annotated
        np.testing.assert_array_equal(
            item["mask_available"], [1] + [0] * 9)

    def test_test_item(self, s4_root):
        cfg = get_config("avss_binary").replace(
            data_root=s4_root, image_width=48, image_height=48,
            num_classes=2, setup="avss")
        ds = S4Dataset(cfg, "test")
        item = ds[0]
        np.testing.assert_array_equal(
            item["mask_available"], [1] * 5 + [0] * 5)
        assert item["pix_label"][:5].max() == 1


class TestMS3:
    def test_train_explosion(self, ms3_root):
        cfg = get_config("avss_binary").replace(
            data_root=ms3_root, image_width=48, image_height=48,
            num_classes=2, setup="avss")
        ds = MS3Dataset(cfg, "train")
        # 2 videos x 5 frames x 2 repeats
        assert len(ds) == 20
        item = ds[0]
        assert item["image"].shape == (1, 48, 48, 3)
        assert item["waveform"].shape == (1, 16000)

    def test_test_videos(self, ms3_root):
        cfg = get_config("avss_binary").replace(
            data_root=ms3_root, image_width=48, image_height=48,
            num_classes=2, setup="avss")
        ds = MS3Dataset(cfg, "test")
        assert len(ds) == 2
        item = ds[0]
        assert item["image"].shape == (10, 48, 48, 3)
        assert item["waveform"].shape == (10, 32000)
        assert np.abs(item["waveform"][5:]).max() == 0.0

    def test_eval_audio_windows_match_reference_view(self, ms3_root):
        """Frame i must hear the 2 s window starting at second 2i — the
        reference's waveform.view(B, T=5, 1, -1) slicing of the 10 s
        crop (trainer_cavp_avs_obj.py:310-323), not second i."""
        from cavp_tpu.data.audio_io import load_audio

        cfg = get_config("avss_binary").replace(
            data_root=ms3_root, image_width=48, image_height=48,
            num_classes=2, setup="avss")
        ds = MS3Dataset(cfg, "test")
        item = ds[0]
        full = load_audio(ds._wav(item["name"]), 10.0).reshape(-1)
        # torch view(5, 32000): row i = samples [32000i, 32000(i+1))
        ref_rows = full.reshape(5, 32000)
        np.testing.assert_allclose(item["waveform"][:5], ref_rows,
                                   atol=1e-6)
