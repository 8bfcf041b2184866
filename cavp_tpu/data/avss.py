"""AVSBench-Semantics dataset (71-class, 10-frame videos).

Rebuilds ``dataset/avss/avss_datasets.py`` + ``visual/visual_dataset.py``
+ ``audio/audio_dataset.py``: metadata.csv rows (uid, label=v1s/v1m/v2,
split), per-video ``frames/%d.jpg`` + ``labels_semantic/%d.png`` padded
to 10, per-subset availability flags, one-hot class labels from mask
uniques, binary collapse for non-"all" splits, and 10 s audio split into
1 s windows. Items are numpy dicts (NHWC images) for the pipeline layer.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pandas as pd
from PIL import Image

from cavp_tpu.data.audio_io import load_audio
from cavp_tpu.data.transforms import VisualAugmentation


def get_v2_palette(num_cls: int = 71) -> List[int]:
    """The AVSBench-v2 color palette (visual_dataset.get_v2_pallete:14-39)."""
    palette = [0] * (num_cls * 3)
    for j in range(num_cls):
        lab = j
        i = 0
        while lab > 0:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


def availability_flags(subset: str, mode: str):
    """visual_dataset.__getflag:82-95."""
    if subset == "v1s":
        frame = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], np.float32)
        if mode == "train":
            mask = np.array([1, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)
        else:
            mask = frame.copy()
    elif subset == "v1m":
        frame = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], np.float32)
        mask = frame.copy()
    else:  # v2
        frame = np.ones(10, np.float32)
        mask = np.ones(10, np.float32)
    return frame, mask


def color_mask_to_label(mask_rgb: np.ndarray, palette) -> np.ndarray:
    """RGB-palette mask decoding (``dataset/avss/color_dataloader.py:
    109-120`` — the V2Dataset variant): maps each RGB pixel back to its
    palette index."""
    pal = np.asarray(palette, np.uint8).reshape(-1, 3)
    h, w = mask_rgb.shape[:2]
    flat = mask_rgb.reshape(-1, 3)
    # exact palette match per pixel
    out = np.zeros((h * w,), np.int32)
    lut = {tuple(c): i for i, c in enumerate(pal)}
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    color_idx = np.array([lut.get(tuple(c), 0) for c in colors], np.int32)
    out = color_idx[inverse]
    return out.reshape(h, w)


class AVSSDataset:
    """Joined visual+audio dataset over metadata.csv."""

    MASK_NUM = 10
    AUDIO_SECONDS = 10.0

    def __init__(self, config, mode: str, dir_base: str = None,
                 meta_csv: str = None):
        self.config = config
        self.mode = mode
        base = dir_base or os.path.join(config.root_dataset_dir,
                                        "avsbench_semantic")
        self.dir_base = base
        csv_fn = meta_csv or os.path.join(base, "metadata.csv")
        df = pd.read_csv(csv_fn, sep=",")
        df = df[df["split"] == mode]
        if config.avsbench_split != "all":
            df = df[df["label"] == config.avsbench_split]
        self.df = df.reset_index(drop=True)
        # one-hot width: the reference VisualDataset always uses the
        # AVSS data config's NUM_CLASSES=71 (visual_dataset.py:68,157),
        # even under avss_binary where the MODEL has 2 classes — the
        # 71-wide img_label is what drives if_match's semantic pairing.
        self.num_classes = 71 if config.setup == "avss_binary" \
            else config.num_classes
        self.palette = get_v2_palette(71)
        self.transform = VisualAugmentation(
            image_mean=config.image_mean, image_std=config.image_std,
            image_width=config.image_width, image_height=config.image_height,
            mode=mode, setup=config.setup, resize_flag=config.resize_flag)

    def __len__(self):
        return len(self.df)

    def _video_dir(self, row, kind: str) -> str:
        return os.path.join(self.dir_base, row["label"], row["uid"], kind)

    def _train_item(self, row, subset, frame_avail, mask_avail,
                    img_paths, mask_paths) -> Dict[str, np.ndarray]:
        """Single-frame train item: decode+augment only the selected
        available frame. Emits frame dim 1 with availability [1,0,...]
        so collate_train_videos picks it unchanged."""
        import random as _random

        avail = np.nonzero((frame_avail > 0) & (mask_avail > 0))[0]
        sel = int(_random.choice(list(avail)))

        img = lab = None
        if sel < len(img_paths) and sel < len(mask_paths):
            pair = self.transform.native_open_pair(img_paths[sel],
                                                   mask_paths[sel])
            if pair is not None:
                img, lab = pair
        if img is None:
            if sel < len(img_paths):
                img = Image.open(img_paths[sel]).convert("RGB")
            else:  # flagged-available but missing on disk: zero pad frame
                ref = Image.open(img_paths[-1]).convert("RGB")
                img = Image.fromarray(np.zeros_like(np.asarray(ref)))
            if sel < len(mask_paths):
                lab = Image.open(mask_paths[sel])
            else:
                ref = Image.open(mask_paths[-1])
                lab = Image.fromarray(np.zeros_like(np.asarray(ref)))
        image, label = self.transform(img, lab)
        image = image[None].astype(np.float32)       # [1, H, W, 3]
        label = label[None].astype(np.int32)          # [1, H, W]

        class_label = np.zeros((1, self.num_classes), np.int32)
        u = np.unique(label[0][label[0] != 255])
        u = u[u < self.num_classes]
        class_label[0, u] = 1

        if self.config.resize_flag:
            if self.config.avsbench_split != "all" or \
                    self.config.setup == "avss_binary":
                label = np.where((label != 255) & (label != 0), 1, label)

        wav = os.path.join(self.dir_base, subset, row["uid"], "audio.wav")
        waveform = load_audio(wav, self.AUDIO_SECONDS)
        waveform = waveform.reshape(self.MASK_NUM, -1)[sel:sel + 1]

        one_hot_avail = np.zeros(1, np.float32)
        one_hot_avail[0] = 1.0
        return {
            "image": image,
            "waveform": waveform.astype(np.float32),
            "pix_label": label,
            "img_label": class_label,
            "name": row["uid"],
            "frame_available": one_hot_avail,
            "mask_available": one_hot_avail,
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[idx]
        subset = row["label"]
        frame_avail, mask_avail = availability_flags(subset, self.mode)

        fn_img = self._video_dir(row, "frames")
        fn_label = self._video_dir(row, "labels_semantic")
        img_files = sorted(f for f in os.listdir(fn_img) if f.endswith(".jpg"))
        mask_files = sorted(f for f in os.listdir(fn_label) if f.endswith(".png"))

        img_paths = [os.path.join(fn_img, f"{i}.jpg")
                     for i in range(len(img_files))]
        mask_paths = [os.path.join(fn_label, f"{i}.png")
                      for i in range(len(mask_files))]

        if self.mode == "train":
            # The reference decodes all 10 frames per item and the
            # trainer then keeps ONE random available frame
            # (trainer_cavp_avss_image.py:157-167) — 90% of host
            # decode+augment work discarded on the hot path. Selecting
            # the frame BEFORE decoding is distributionally identical
            # (host randomness parity is distributional, SURVEY §7) and
            # cuts the train host pipeline ~10x.
            return self._train_item(row, subset, frame_avail, mask_avail,
                                    img_paths, mask_paths)

        # Eval fast path: threaded native decode (no PIL, no GIL) —
        # replaces the reference's 16-worker DataLoader decode
        # (main_avss.py DataLoader(num_workers=16)).
        nat = self.transform.native_eval_batch(img_paths, mask_paths)
        if nat is not None:
            image, label = nat
            pad_i = self.MASK_NUM - image.shape[0]
            pad_m = self.MASK_NUM - label.shape[0]
            if pad_i:
                # PIL path pads with zero *images* that then normalize
                # to -mean/std; match exactly.
                fill = ((0.0 - self.transform.mean) / self.transform.std
                        ).astype(image.dtype)
                pad_block = np.broadcast_to(
                    fill, (pad_i,) + image.shape[1:]).copy()
                image = np.concatenate([image, pad_block])
            if pad_m:
                label = np.concatenate(
                    [label, np.zeros((pad_m,) + label.shape[1:],
                                     label.dtype)])
        else:
            images, labels = [], []
            for p in img_paths:
                images.append(Image.open(p).convert("RGB"))
            for _ in range(self.MASK_NUM - len(images)):
                images.append(Image.fromarray(
                    np.zeros_like(np.asarray(images[-1]))))
            for p in mask_paths:
                labels.append(Image.open(p))
            for _ in range(self.MASK_NUM - len(labels)):
                labels.append(Image.fromarray(
                    np.zeros_like(np.asarray(labels[-1]))))

            pack = [self.transform(im, lb) for im, lb in zip(images, labels)]
            image = np.stack([p[0] for p in pack])       # [10, H, W, 3]
            label = np.stack([p[1] for p in pack])       # [10, H, W]

        # one-hot class labels from per-frame mask uniques
        class_label = np.zeros((self.MASK_NUM, self.num_classes), np.int32)
        for i in range(self.MASK_NUM):
            u = np.unique(label[i][label[i] != 255])
            u = u[u < self.num_classes]
            class_label[i, u] = 1

        # binary collapse (visual_dataset.py:160-165)
        if self.config.resize_flag:
            if self.config.avsbench_split != "all" or \
                    self.config.setup == "avss_binary":
                label = np.where((label != 255) & (label != 0), 1, label)

        wav = os.path.join(self.dir_base, subset, row["uid"], "audio.wav")
        waveform = load_audio(wav, self.AUDIO_SECONDS)  # [1, 160000]
        waveform = waveform.reshape(self.MASK_NUM, -1)  # 10 x 1s windows

        return {
            "image": image.astype(np.float32),
            "waveform": waveform.astype(np.float32),
            "pix_label": label.astype(np.int32),
            "img_label": class_label,
            "name": row["uid"],
            "frame_available": frame_avail,
            "mask_available": mask_avail,
        }
