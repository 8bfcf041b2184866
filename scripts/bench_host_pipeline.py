#!/usr/bin/env python
"""Absolute host input-pipeline throughput (VERDICT round-2 item 3).

Measures items/s (and frames/s) of the three host paths on this host's
cores, against a synthetic AVSS tree at realistic source resolution
(default 512x512 JPEG — AVSBench frames are 360p-720p):

  (a) PIL train path: single-frame decode + random
      hflip/scale/resize-or-crop augmentation (the production train
      __getitem__), single-thread and through the thread-pool
      DataLoader;
  (b) native eval path: 10-frame videos through the C++ threaded
      decoder (the production eval __getitem__);
  (c) tf.data eval pipeline (--use_tfdata).

The question these answer (docs/performance.md): is an 8-chip v5e host
input-bound at 424 img/s/chip train (3.4k img/s global) and ~2.1k
frames/s/chip eval?  Run on the target host for real capacity numbers;
this VM gives the shape and the per-core figure.

One JSON line per measurement.
"""

import json
import multiprocessing
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import numpy as np

    from cavp_tpu.config import get_config
    from cavp_tpu.data.avss import AVSSDataset
    from cavp_tpu.data.pipeline import DataLoader, collate_train_videos, \
        collate_eval_videos
    from cavp_tpu.data.synthetic import make_synthetic_avss

    src = int(os.environ.get("SRC_SIZE", "512"))
    n_videos = int(os.environ.get("N_VIDEOS", "24"))
    ncores = multiprocessing.cpu_count()
    emit(host_cores=ncores, src_size=src, n_videos=n_videos)

    tmp = tempfile.mkdtemp(prefix="bench_host_")
    root = make_synthetic_avss(tmp, num_videos=n_videos, image_size=src,
                               num_classes=8)

    # ---- (a) PIL train path, avss-224 (resize) and avss-512 (crop) ----
    for name, cfg in (
        ("train_224_resize", get_config("avss").replace(
            image_width=224, image_height=224, resize_flag=True,
            num_classes=8)),
        ("train_512_crop", get_config("avss").replace(num_classes=8)),
    ):
        ds = AVSSDataset(cfg, "train", dir_base=root)
        for _ in range(4):
            _ = ds[0]  # warm cache
        t0 = time.perf_counter()
        reps, n = 0, len(ds)
        while time.perf_counter() - t0 < 5.0:
            _ = ds[reps % n]
            reps += 1
        dt = time.perf_counter() - t0
        emit(metric=f"host_{name}_items_per_sec_1thread",
             value=round(reps / dt, 1), unit="items/s")

        for workers in (8, min(16, ncores)):
            loader = DataLoader(ds, 16, collate_train_videos,
                                num_workers=workers, shuffle=True, seed=0)
            t0 = time.perf_counter()
            items = 0
            for batch in loader:
                items += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            emit(metric=f"host_{name}_items_per_sec_{workers}workers",
                 value=round(items / dt, 1), unit="items/s",
                 note="one item == one decoded+augmented train frame")

    # ---- (b) native eval path (10-frame videos, C++ decode) ----
    cfg = get_config("avss").replace(image_width=224, image_height=224,
                                     resize_flag=True, num_classes=8)
    ds = AVSSDataset(cfg, "test", dir_base=root)
    from cavp_tpu import native
    emit(native_available=native.available())
    for _ in range(2):
        _ = ds[0]
    t0 = time.perf_counter()
    reps, frames = 0, 0
    while time.perf_counter() - t0 < 5.0:
        item = ds[reps % len(ds)]
        frames += item["image"].shape[0]
        reps += 1
    dt = time.perf_counter() - t0
    emit(metric="host_eval_native_frames_per_sec_1caller",
         value=round(frames / dt, 1), unit="frames/s")

    for workers in (4, 8):
        loader = DataLoader(ds, 4, collate_eval_videos, num_workers=workers)
        t0 = time.perf_counter()
        frames = 0
        for batch in loader:
            frames += int(np.sum(batch["valid"]))
        dt = time.perf_counter() - t0
        emit(metric=f"host_eval_native_frames_per_sec_{workers}workers",
             value=round(frames / dt, 1), unit="frames/s")

    # ---- (c) tf.data eval pipeline ----
    try:
        from cavp_tpu.data.tfdata import TfEvalLoader

        loader = TfEvalLoader(ds, cfg, batch_videos=4)
        for _ in loader:   # warm (graph build + autotune)
            break
        frames = 0
        t0 = time.perf_counter()
        for batch in loader:
            frames += int(np.sum(np.asarray(batch["valid"])))
        dt = time.perf_counter() - t0
        emit(metric="host_eval_tfdata_frames_per_sec",
             value=round(frames / dt, 1), unit="frames/s")
    except Exception as e:  # tf optionality
        emit(metric="host_eval_tfdata_frames_per_sec", error=str(e)[:200])


if __name__ == "__main__":
    main()
