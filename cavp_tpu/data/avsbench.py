"""AVSBench-Object datasets (S4 single-source, MS3 multi-source, binary).

Rebuilds ``dataset/avsbench_s4.py:38-152`` and
``dataset/avsbench_ms.py:37-185``: S4's 5 frames ``%s_%d.png`` with
train keeping mask 1 only; MS3's train split exploded to per-frame rows
x5 then duplicated x2; 10 s audio center-crop with MS3's per-frame 1 s
slice; binary masks (PIL mode '1').
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
from PIL import Image

from cavp_tpu.config.class_list import INDEX_TABLE_AVS
from cavp_tpu.data.audio_io import load_audio
from cavp_tpu.data.transforms import VisualAugmentation


def s4_paths(data_root: str) -> Dict[str, str]:
    """config/avsbench/config_avsbench_s4.py."""
    base = os.path.join(data_root, "avsbench_data", "Single-source")
    return {
        "anno_csv": os.path.join(base, "s4_meta_data.csv"),
        "dir_img": os.path.join(base, "s4_data", "visual_frames"),
        "dir_mask": os.path.join(base, "s4_data", "gt_masks"),
        "dir_wav": os.path.join(base, "s4_data", "audio_wav"),
    }


def ms3_paths(data_root: str) -> Dict[str, str]:
    base = os.path.join(data_root, "avsbench_data", "Multi-sources")
    return {
        "anno_csv": os.path.join(base, "ms3_meta_data.csv"),
        "dir_img": os.path.join(base, "ms3_data", "visual_frames"),
        "dir_mask": os.path.join(base, "ms3_data", "gt_masks"),
        "dir_wav": os.path.join(base, "ms3_data", "audio_wav"),
    }


class S4Dataset:
    """avsbench_s4.S4Dataset. Items: 5-frame videos padded to 10 with
    availability flags matching the AVSS layout so one eval path serves
    both."""

    AUDIO_SECONDS = 10.0

    def __init__(self, config, split: str = "train"):
        self.config = config
        self.split = split
        self.mask_num = 1 if split == "train" else 5
        self.paths = s4_paths(config.data_root)
        df = pd.read_csv(self.paths["anno_csv"], sep=",")
        self.df = df[df["split"] == split].reset_index(drop=True)
        self.transform = VisualAugmentation(
            image_mean=config.image_mean, image_std=config.image_std,
            image_width=config.image_width, image_height=config.image_height,
            mode=split, setup=config.setup)
        self.test_resize = config.resize_flag

    def __len__(self):
        return len(self.df)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[index]
        video_name, category = row.iloc[0], row.iloc[2]
        img_base = os.path.join(self.paths["dir_img"], self.split, category,
                                video_name)
        mask_base = os.path.join(self.paths["dir_mask"], self.split, category,
                                 video_name)
        wav = os.path.join(self.paths["dir_wav"], self.split, category,
                           video_name + ".wav")

        img_paths = [os.path.join(img_base, f"{video_name}_{i}.png")
                     for i in range(1, 6)]
        mask_paths = [os.path.join(mask_base, f"{video_name}_{i}.png")
                      for i in range(1, self.mask_num + 1)]

        nat = None
        if self.split != "train":
            nat = self.transform.native_eval_batch(img_paths, mask_paths)
        if nat is not None:
            image, label = nat
            label = np.clip(label, 0, 1)
            if label.shape[0] < 5:
                label = np.concatenate(
                    [label, np.zeros((5 - label.shape[0],) + label.shape[1:],
                                     label.dtype)])
        else:
            images, labels = [], []
            for p in img_paths:
                im = self.transform.native_open_rgb(p)
                images.append(im if im is not None
                              else Image.open(p).convert("RGB"))
            for p in mask_paths:
                lb = self.transform.native_open_binary_mask(p)
                labels.append(lb if lb is not None
                              else Image.open(p).convert("1"))
            while len(labels) < 5:
                labels.append(Image.fromarray(
                    np.zeros_like(np.asarray(labels[-1]))))

            if self.split == "train":
                pack = [self.transform(im, lb)
                        for im, lb in zip(images, labels)]
            else:
                pack = [self.transform.test_aug(im, lb)
                        for im, lb in zip(images, labels)]
            image = np.stack([p[0] for p in pack])
            label = np.stack([p[1] for p in pack]).astype(np.int32)
            label = np.clip(label, 0, 1)  # PIL '1' -> {0,1}

        # The reference J&F test slices the 10 s crop as
        # waveform.view(B, T=5, 1, -1): frame i hears the 2 s window
        # [2i, 2i+2) (the mel keeps its first ~0.96 s) — NOT second i
        # (trainer_cavp_avs_obj.py:310-323). Rows 5-9 pad the unavailable
        # frame slots.
        waveform = load_audio(wav, self.AUDIO_SECONDS).reshape(5, -1)
        waveform = np.concatenate([waveform, np.zeros_like(waveform)], 0)

        if self.config.num_classes <= 2:
            class_label = np.tile(np.array([[0, 1]], np.int32), (10, 1))
        else:
            class_label = np.zeros((10, len(INDEX_TABLE_AVS)), np.int32)
            class_label[:, INDEX_TABLE_AVS.index(category)] = 1

        pad = lambda x: np.concatenate(
            [x, np.zeros((5,) + x.shape[1:], x.dtype)], axis=0)
        frame_avail = np.array([1] * 5 + [0] * 5, np.float32)
        mask_avail = np.array(
            [1] + [0] * 9 if self.split == "train" else [1] * 5 + [0] * 5,
            np.float32)
        return {
            "image": pad(image.astype(np.float32)),
            "waveform": waveform.astype(np.float32),
            "pix_label": pad(label),
            "img_label": class_label,
            "name": video_name,
            "frame_available": frame_avail,
            "mask_available": mask_avail,
        }


class MS3Dataset:
    """avsbench_ms.MS3Dataset. Train = per-frame rows (x5 frames x2
    repeats) with the frame's 1 s audio slice; test = 5-frame videos."""

    AUDIO_SECONDS = 10.0

    def __init__(self, config, split: str = "train"):
        self.config = config
        self.split = split
        self.mask_num = 5
        self.paths = ms3_paths(config.data_root)
        df = pd.read_csv(self.paths["anno_csv"], sep=",")
        self.df = df[df["split"] == split].reset_index(drop=True)
        if split == "train":
            rows = []
            for _, r in self.df.iterrows():
                for img_id in range(1, 6):
                    rows.append((r["video_id"], img_id))
            self.train_rows = rows * 2  # avsbench_ms.py:86-87
        self.transform = VisualAugmentation(
            image_mean=config.image_mean, image_std=config.image_std,
            image_width=config.image_width, image_height=config.image_height,
            mode=split, setup=config.setup)

    def __len__(self):
        return len(self.train_rows) if self.split == "train" else len(self.df)

    def _wav(self, video):
        return os.path.join(self.paths["dir_wav"], self.split, video + ".wav")

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.split == "train":
            video, img_id = self.train_rows[index]
            img_p = os.path.join(self.paths["dir_img"], video,
                                 f"{video}.mp4_{img_id}.png")
            mask_p = os.path.join(self.paths["dir_mask"], self.split, video,
                                  f"{video}_{img_id}.png")
            image = self.transform.native_open_rgb(img_p)
            if image is None:
                image = Image.open(img_p).convert("RGB")
            label = self.transform.native_open_binary_mask(mask_p)
            if label is None:
                label = Image.open(mask_p).convert("1")
            x, y = self.transform(image, label)
            y = np.clip(y.astype(np.int32), 0, 1)
            waveform = load_audio(self._wav(video), self.AUDIO_SECONDS)
            waveform = waveform.reshape(10, -1)[img_id - 1:img_id]
            # F.one_hot((mask.sum()!=0).long(), 2) — avsbench_ms.py:135-136:
            # [0,1] for non-empty masks, [1,0] for empty; bg bit NOT forced
            class_label = np.zeros((1, self.config.num_classes), np.int32)
            class_label[0, 1 if y.sum() > 0 else 0] = 1
            return {
                "image": x[None].astype(np.float32),
                "waveform": waveform.astype(np.float32),
                "pix_label": y[None],
                "img_label": class_label,
                "name": video,
            }

        row = self.df.iloc[index]
        video = row["video_id"]
        img_paths = [os.path.join(self.paths["dir_img"], video,
                                  f"{video}.mp4_{i}.png") for i in range(1, 6)]
        mask_paths = [os.path.join(self.paths["dir_mask"], self.split, video,
                                   f"{video}_{i}.png") for i in range(1, 6)]
        nat = self.transform.native_eval_batch(img_paths, mask_paths)
        if nat is not None:
            image, label = nat
            label = np.clip(label, 0, 1)
        else:
            images = [Image.open(p).convert("RGB") for p in img_paths]
            labels = [Image.open(p).convert("1") for p in mask_paths]
            pack = [self.transform.test_aug(im, lb)
                    for im, lb in zip(images, labels)]
            image = np.stack([p[0] for p in pack])
            label = np.clip(np.stack([p[1] for p in pack]).astype(np.int32),
                            0, 1)
        # 2 s windows per frame, as in the reference J&F test (see
        # S4Dataset.__getitem__ above / trainer_cavp_avs_obj.py:310-323)
        waveform = load_audio(self._wav(video), self.AUDIO_SECONDS).reshape(5, -1)
        waveform = np.concatenate([waveform, np.zeros_like(waveform)], 0)
        pad = lambda x: np.concatenate(
            [x, np.zeros((5,) + x.shape[1:], x.dtype)], axis=0)
        class_label = np.tile(np.array([[0, 1]], np.int32), (10, 1))
        return {
            "image": pad(image.astype(np.float32)),
            "waveform": waveform.astype(np.float32),
            "pix_label": pad(label),
            "img_label": class_label,
            "name": video,
            "frame_available": np.array([1] * 5 + [0] * 5, np.float32),
            "mask_available": np.array([1] * 5 + [0] * 5, np.float32),
        }
