"""tf.data host input pipeline (optional, faster than the thread-pool
loader for decode-heavy workloads).

The north-star pipeline layer (BASELINE.json: "AVSBench/VPO data fetch,
resize, and augmentation move to a Grain/tf.data host pipeline
overlapped with device steps"): JPEG/PNG decode, resize and normalize
run inside tf.data's parallel C++ runtime, producing the same numpy
batch dicts as :mod:`cavp_tpu.data.pipeline`. TensorFlow is imported
lazily and pinned to CPU so it never competes for the TPU.

Augmentation parity note: the random scale/crop/flip pipeline here
mirrors ``visual_aug.py`` distributions using TF ops (bicubic image /
nearest mask resize); exact PIL bit-parity is not required for training
(host-side randomness is distributional parity per SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator

import numpy as np


@functools.lru_cache(maxsize=None)
def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    try:
        tf.config.set_visible_devices([], "TPU")
    except Exception:
        pass
    return tf


def make_avss_eval_dataset(file_table, config, batch_videos: int = 1,
                           prefetch: int = 2):
    """file_table: list of dicts with per-video frame/mask paths (10 each,
    possibly padded by repetition), wav path, and availability flags.

    Returns an iterator of numpy batch dicts shaped like
    ``collate_eval_videos`` output.
    """
    tf = _tf()
    H, W = config.image_height, config.image_width
    mean = np.asarray(config.image_mean, np.float32)
    std = np.asarray(config.image_std, np.float32)

    frames = np.array([t["frames"] for t in file_table])        # [N, 10]
    masks = np.array([t["masks"] for t in file_table])          # [N, 10]
    wavs = np.array([t["wav"] for t in file_table])             # [N]
    valid = np.array([t["mask_available"] for t in file_table],
                     np.float32)                                 # [N, 10]

    def _decode_video(frame_paths, mask_paths, wav_path, avail):
        def decode_frame(p):
            img = tf.io.decode_image(tf.io.read_file(p), channels=3,
                                     expand_animations=False)
            img = tf.image.resize(img, (H, W), method="bicubic")
            img = (tf.cast(img, tf.float32) / 255.0 - mean) / std
            return img

        def decode_mask(p):
            # NOT tf.io.decode_png: TF expands palette PNGs to RGB (and
            # channels=1 takes luminance), destroying the class indices
            # the AVSS labels encode as palette entries. Route through
            # the native decoder (raw palette indices + nearest resize),
            # PIL fallback.
            m = tf.py_function(_decode_mask_np, [p], tf.int32)
            m.set_shape([H, W])
            return m

        imgs = tf.map_fn(decode_frame, frame_paths, fn_output_signature=tf.float32)
        ms = tf.map_fn(decode_mask, mask_paths, fn_output_signature=tf.int32)
        wav = tf.py_function(_load_wav_np, [wav_path], tf.float32)
        wav.set_shape([10, None])
        return {"image": imgs, "pix_label": ms, "waveform": wav,
                "valid": avail}

    def _load_wav_np(path):
        from cavp_tpu.data.audio_io import load_audio

        w = load_audio(path.numpy().decode(), 10.0)
        return w.reshape(10, -1).astype(np.float32)

    def _decode_mask_np(path):
        p = path.numpy().decode()
        from cavp_tpu import native

        if native.available():
            return native.decode_mask(p, H, W)
        from PIL import Image

        img = Image.open(p)  # palette/gray indices stay raw
        img = img.resize((W, H), Image.NEAREST)
        return np.asarray(img).astype(np.int32)

    ds = tf.data.Dataset.from_tensor_slices((frames, masks, wavs, valid))
    ds = ds.map(_decode_video, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_videos)
    ds = ds.prefetch(prefetch)

    def iterate() -> Iterator[Dict[str, np.ndarray]]:
        for batch in ds.as_numpy_iterator():
            batch["waveform"] = batch["waveform"][..., None, :]  # [B,T,1,L]
            yield batch

    return iterate()


class TfEvalLoader:
    """Re-iterable tf.data eval loader with the DataLoader interface the
    runner's validation loop consumes (``--use_tfdata``). Each
    ``__iter__`` builds a fresh tf.data iterator, so validation can run
    every epoch gate."""

    def __init__(self, dataset, config, batch_videos: int = 8):
        import jax

        table = avss_file_table(dataset)
        # disjoint strided shard per process (merged in run_validation)
        self.table = table[jax.process_index()::jax.process_count()]
        self.config = config
        self.batch_videos = batch_videos

    def __len__(self):
        return (len(self.table) + self.batch_videos - 1) // self.batch_videos

    def __iter__(self):
        return make_avss_eval_dataset(self.table, self.config,
                                      batch_videos=self.batch_videos)


def avss_file_table(dataset) -> list:
    """Build the path table from an :class:`cavp_tpu.data.avss.AVSSDataset`."""
    import os

    from cavp_tpu.data.avss import availability_flags

    table = []
    for i in range(len(dataset)):
        row = dataset.df.iloc[i]
        vdir = os.path.join(dataset.dir_base, row["label"], row["uid"])
        n_frames = len([f for f in os.listdir(os.path.join(vdir, "frames"))
                        if f.endswith(".jpg")])
        frames = [os.path.join(vdir, "frames", f"{min(j, n_frames - 1)}.jpg")
                  for j in range(10)]
        n_masks = len([f for f in os.listdir(
            os.path.join(vdir, "labels_semantic")) if f.endswith(".png")])
        masks = [os.path.join(vdir, "labels_semantic",
                              f"{min(j, n_masks - 1)}.png")
                 for j in range(10)]
        _, mask_avail = availability_flags(row["label"], dataset.mode)
        table.append({
            "frames": frames, "masks": masks,
            "wav": os.path.join(vdir, "audio.wav"),
            "mask_available": mask_avail,
        })
    return table
