"""VPO datasets (COCO images + VGGSound audio synthetic pairs).

Rebuilds the four ``dataset/vpo_{mono,stereo}/{single,multi}_source``
trees: COCO image/mask path derivation (``process_coco_fn``), the
COCO-id -> VPO-index mask remap, amplitude panning for stereo, multi-
source grouping by img_Id with mixture synthesis, hflip-aware pan
mirroring, and the msmi -> VPO-MS fallback for ``multi_instance == 0``.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pandas as pd
from PIL import Image

from cavp_tpu.data.audio_io import crop_audio, load_wav, mix_sources, pan_stereo, resample
from cavp_tpu.data.transforms import VisualAugmentation


def process_coco_fn(row, root_name: str, ext: str = "jpg", mask: bool = False,
                    setup: str = None, per_category_dir: bool = True) -> str:
    img_n = str(row["img_Id"]).zfill(12)
    mask_n = str(row["ann_Ids"]).zfill(12)
    name = f"{img_n}_{mask_n}.{ext}" if mask else f"{img_n}.{ext}"
    if per_category_dir:
        fn = os.path.join(root_name, row["cateName"], name)
    else:
        fn = os.path.join(root_name, name)
    if setup == "vpo_msmi" and row.get("multi_instance", 1) == 0:
        fn = fn.replace("VPO-MSMI", "VPO-MS")
    return fn


def prepare_train_data(df: pd.DataFrame, config,
                       per_category_dir: bool = True) -> pd.DataFrame:
    """visual_dataset.prepare_train_data:21-46."""
    df = df.copy()
    if config.replace_name:
        df = df.replace({"male": "person", "female": "person",
                         "baby": "person"})
        df["cateId"] = df["cateId"].replace({92: 1, 93: 1, 94: 1})
    df["audio_fp"] = df["vgg_file"].apply(
        lambda x: os.path.join(config.vgg_data_path, "audios", x + ".wav"))
    df["image_fp"] = df.apply(
        lambda r: process_coco_fn(r, config.coco_img_root, "jpg",
                                  setup=config.setup,
                                  per_category_dir=per_category_dir), axis=1)
    df["mask_fp"] = df.apply(
        lambda r: process_coco_fn(r, config.coco_mask_root, "png", mask=True,
                                  setup=config.setup,
                                  per_category_dir=per_category_dir), axis=1)
    df["split"] = df["split"].replace("val", "test")
    return df


def _load_crop(path: str, audio_len: float) -> np.ndarray:
    wave, sr = load_wav(path)
    wave = resample(wave, sr)
    return crop_audio(wave, audio_len)


class VPODataset:
    """Unified single/multi-source, mono/stereo VPO dataset.

    multi_source groups rows by img_Id and mixes panned sources
    (multi_source/audio/audio_dataset.py:51-71); stereo pans each source
    by its ``audio_pos`` with hflip mirroring (av_datasets.py:53-54).
    """

    def __init__(self, config, mode: str, dataframe: pd.DataFrame,
                 stereo: bool = True, multi_source: bool = False,
                 per_category_dir: bool = None):
        self.config = config
        self.mode = mode
        self.stereo = stereo
        self.multi_source = multi_source
        if per_category_dir is None:
            per_category_dir = not multi_source
        df = prepare_train_data(dataframe, config, per_category_dir)
        df = df[df["split"] == ("train" if mode == "train" else "test")]
        self.df = df.reset_index(drop=True)
        self.transform = VisualAugmentation(
            image_mean=config.image_mean, image_std=config.image_std,
            image_width=config.image_width, image_height=config.image_height,
            mode=mode, setup=config.setup, return_flip=True)
        self.index_table = config.index_table
        self.class_dict = config.class_dict
        self.num_classes = config.num_classes

        if multi_source:
            self.groups: List[pd.DataFrame] = [
                g for _, g in self.df.groupby("img_Id", sort=False)]
        else:
            self.groups = None

    def __len__(self):
        return len(self.groups) if self.multi_source else len(self.df)

    def _remap_mask(self, label: np.ndarray) -> np.ndarray:
        """COCO-id -> VPO index remap (visual_dataset.py:124-135).

        NOTE: the reference remaps sequentially IN PLACE over ascending
        uniques, so a write can alias a later COCO id (e.g. car COCO 3 ->
        VPO 5, then airplane COCO 5 -> 1 also re-remaps those car
        pixels) — a latent data-corruption bug we deliberately do NOT
        replicate (all reads here come from the original array)."""
        out = label.copy()
        for cid in np.unique(label):
            if cid in (0, 255):
                continue
            name = self.class_dict.get(str(int(cid)))
            if name is None:
                continue
            out[label == cid] = self.index_table.index(name)
        return out

    def _category_onehot(self, cate_names: str) -> np.ndarray:
        onehot = np.zeros((self.num_classes,), np.int32)
        onehot[0] = 1
        for name in str(cate_names).split(","):
            if name in self.index_table:
                onehot[self.index_table.index(name)] = 1
        return onehot

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rows = self.groups[idx] if self.multi_source else self.df.iloc[[idx]]
        first = rows.iloc[0]

        image = self.transform.native_open_rgb(first["image_fp"])
        if image is None:
            image = Image.open(first["image_fp"]).convert("RGB")
        label = self.transform.native_open_index_mask(first["mask_fp"])
        if label is None:
            label = Image.open(first["mask_fp"])
        x, y, flip = self.transform(image, label)
        y = self._remap_mask(y.astype(np.int32))

        audio_len = self.config.audio_len
        waves = []
        for _, r in rows.iterrows():
            w = _load_crop(r["audio_fp"], audio_len)
            pos = float(r.get("audio_pos", 0.5))
            # only the MULTI-source reference plumbs the flip into the
            # panning (multi_source audio_dataset.py:58 `1 - pos if
            # flip`); single-source pans by the raw audio_pos
            if flip and self.mode == "train" and self.multi_source:
                pos = 1.0 - pos
            if self.stereo:
                waves.append(pan_stereo(w, pos))
            else:
                waves.append(np.mean(w, axis=0, keepdims=True))
        waveform = mix_sources(waves) if len(waves) > 1 else waves[0]

        if self.multi_source:
            # multi-source img_label comes from the REMAPPED mask's
            # uniques (multi_source visual_dataset.py:148-150): crops
            # can drop a source, and the bg bit is set only when
            # background pixels survive
            onehot = np.zeros((self.num_classes,), np.int32)
            u = np.unique(y)
            u = u[(u != 255) & (u < self.num_classes)]
            onehot[u] = 1
        else:
            # single-source: metadata categories + forced bg bit
            # (single_source visual_dataset.py:77-80,138-141)
            onehot = np.zeros((self.num_classes,), np.int32)
            onehot[0] = 1
            for _, r in rows.iterrows():
                onehot |= self._category_onehot(r["cateName"])

        return {
            "image": x.astype(np.float32),
            "waveform": waveform.astype(np.float32),  # [C, L]
            "pix_label": y.astype(np.int32),
            "img_label": onehot,
            "name": str(first["img_Id"]),
        }


def select_vpo_csv(config, stereo: bool) -> str:
    """main_vpo_{mono,stereo}.py CSV dispatch (:139-157)."""
    suffix = "stereo" if stereo else "mono"
    name = {
        "vpo_ss": f"vpo_ss_data_{suffix}.csv",
        "vpo_ms": f"vpo_ms_data_{suffix}.csv",
        "vpo_msmi": f"vpo_msmi_data_{suffix}.csv",
    }[config.setup]
    return os.path.join(config.vpo_data_path, name)
