"""Host input pipeline: prefetching loader + batch assembly.

The grain/tf.data-equivalent layer (BASELINE.json: "data fetch, resize,
and augmentation move to a host pipeline overlapped with device steps")
replacing ``torch.utils.data.DataLoader(num_workers=16, pin_memory)``:
a thread-pool prefetcher decodes/augments items ahead of the device
step, and collation produces the dense numpy batches the jitted steps
consume.

Batch assembly also absorbs the host-side randomness of the reference's
train loop: the per-sample random *available-frame* selection
(``trainer_cavp_avss_image.py:157-167``) lives here, and eval batches
are padded [videos x 10 frames] stacks with validity masks replacing the
reference's batch-1 per-frame python loop.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def shard_indices(n: int, process_index: int, process_count: int,
                  shuffle: bool, seed: int, pad: bool = True) -> List[int]:
    """DistributedSampler semantics (main_avss_resize.py:163-176):
    per-epoch shuffle + contiguous shard per process, padded to even by
    wrap-around repetition (torch pads with ``indices[:padding]``) so
    every process gets exactly ``ceil(n / process_count)`` items — even
    when ``process_count > n``, where a shorter repeat would hand some
    processes an empty shard and deadlock the data-parallel collectives.

    ``pad=False`` gives strided disjoint shards without duplication —
    required for process-sharded *evaluation*, where the torch-style
    duplicate padding would double-count items in the merged metrics.
    """
    if n == 0:
        return []
    idx = list(range(n))
    if shuffle:
        random.Random(seed).shuffle(idx)
    if process_count > 1:
        if pad:
            per = (n + process_count - 1) // process_count
            reps = (per * process_count + n - 1) // n
            idx = (idx * reps)[process_index * per:(process_index + 1) * per]
        else:
            idx = idx[process_index::process_count]
    return idx


class DataLoader:
    """Thread-pool prefetching loader over an indexable dataset."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool = False, drop_last: bool = False,
                 num_workers: int = 8, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch_batches: int = 2, pad_shards: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch_batches = prefetch_batches
        self.pad_shards = pad_shards

    def set_epoch(self, epoch: int):
        """sampler.set_epoch parity (main_avss_resize.py:214)."""
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.process_count > 1:
            n = (n + self.process_count - 1) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = shard_indices(len(self.dataset), self.process_index,
                                self.process_count, self.shuffle,
                                self.seed + self.epoch,
                                pad=self.pad_shards)
        batches: List[List[int]] = []
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer abandoned the
            iterator (e.g. max_steps_per_epoch broke out of the loop) —
            a plain blocking put would pin the producer thread and its
            prefetched batches forever."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__,
                                              chunk))
                        if not _put(self.collate_fn(items)):
                            return
                _put(None)
            except BaseException as exc:
                # surface the failure to the consumer — dying silently
                # would leave the training loop blocked in out_q.get()
                _put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


# ---------------------------------------------------------------------------
# Collation
# ---------------------------------------------------------------------------


def collate_stack(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        v0 = items[0][k]
        if isinstance(v0, str):
            out[k] = [it[k] for it in items]
        else:
            out[k] = np.stack([it[k] for it in items])
    return out


def collate_train_videos(items, rng: Optional[random.Random] = None
                         ) -> Dict[str, np.ndarray]:
    """AVSS train collation: pick one random available frame per video
    (trainer_cavp_avss_image.py:157-167), emit single-frame batch."""
    rng = rng or random
    images, waves, pix, img_lab, names = [], [], [], [], []
    for it in items:
        avail = (it["frame_available"] + it["mask_available"]) == 2
        choices = np.nonzero(avail)[0]
        sel = int(rng.choice(list(choices)))
        images.append(it["image"][sel])
        waves.append(it["waveform"][sel][None])  # [1, L]
        pix.append(it["pix_label"][sel])
        img_lab.append(it["img_label"][sel])
        names.append(it["name"])
    return {
        "image": np.stack(images),
        "waveform": np.stack(waves),
        "pix_label": np.stack(pix),
        "img_label": np.stack(img_lab),
        "name": names,
    }


def collate_train_frames(items) -> Dict[str, np.ndarray]:
    """Single-frame datasets (VPO, MS3-train): squeeze the frame dim."""
    out = collate_stack(items)
    if out["image"].ndim == 5:
        out["image"] = out["image"][:, 0]
    if out["pix_label"].ndim == 4:
        out["pix_label"] = out["pix_label"][:, 0]
    if out["img_label"].ndim == 3:
        out["img_label"] = out["img_label"][:, 0]
    if out["waveform"].ndim == 4:
        out["waveform"] = out["waveform"][:, 0]
    return out


def collate_eval_videos(items) -> Dict[str, np.ndarray]:
    """Eval collation: [B, 10, ...] padded videos + validity from
    mask_available (replaces the reference's per-frame batch-1 loop)."""
    out = collate_stack(items)
    out["valid"] = out.pop("mask_available")
    out["waveform"] = out["waveform"][..., None, :]  # [B, T, 1, L]
    return out


def collate_eval_frames(items) -> Dict[str, np.ndarray]:
    """Single-frame eval collation (VPO validation,
    trainer_cavp_vpo_mono.py:260-320): every frame valid."""
    out = collate_train_frames(items)
    out["valid"] = np.ones((out["image"].shape[0],), np.float32)
    return out


def flatten_video_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """[B, T, ...] -> [B*T, ...] for the flat eval step."""
    flat = {}
    B, T = batch["image"].shape[:2]
    for k in ("image", "waveform", "pix_label"):
        v = batch[k]
        flat[k] = v.reshape((B * T,) + v.shape[2:])
    flat["valid"] = batch["valid"].reshape(B * T)
    return flat


def repack_valid_frames(batches, frame_batch: int = 0):
    """Drop invalid (padding) frames and re-emit dense fixed-size flat
    batches.

    AVSS videos are padded to 10 frame slots but v1s/v1m videos carry
    only 5 real frames (`visual_dataset.py:82-95` availability flags) —
    the flat eval step runs the full forward on every slot and only
    zero-weights the padding in the metrics. Repacking keeps the exact
    same metric sums (dropped frames contributed weight 0; the final
    partial batch is zero-padded with valid=0) while skipping the dead
    forward passes — on a v1-heavy split that is ~2x fewer eval steps.
    A fixed output size (default: the first batch's flat size) also
    keeps one compiled shape even when the loader's last batch is
    ragged.
    """
    buf = None
    for batch in batches:
        if frame_batch == 0:
            frame_batch = batch["valid"].shape[0]
        keep = batch["valid"] > 0
        part = {k: v[keep] for k, v in batch.items()}
        buf = part if buf is None else {
            k: np.concatenate([buf[k], part[k]]) for k in part}
        while buf["valid"].shape[0] >= frame_batch:
            yield {k: v[:frame_batch] for k, v in buf.items()}
            buf = {k: v[frame_batch:] for k, v in buf.items()}
    if buf is not None and buf["valid"].shape[0]:
        n = buf["valid"].shape[0]
        out = {}
        for k, v in buf.items():
            pad = np.zeros((frame_batch - n,) + v.shape[1:], v.dtype)
            out[k] = np.concatenate([v, pad])
        yield out
