"""Synthetic data: on-disk fixtures + in-memory batch generators.

The reference has no test fixtures at all (SURVEY.md §4); this module
generates (a) a miniature on-disk AVSBench-Semantics layout so the real
dataset/pipeline code paths are exercised end-to-end in tests, and
(b) in-memory random batches with the exact shapes of each setup for
benchmarking and compile checks.
"""

from __future__ import annotations

import os
import wave as wave_mod
from typing import Dict, Optional

import numpy as np
from PIL import Image


def write_wav(path: str, data: np.ndarray, sr: int = 16000):
    """data: [channels, samples] float32 in [-1, 1] -> 16-bit PCM."""
    pcm = (np.clip(data, -1, 1) * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(data.shape[0])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.T.tobytes())


def make_synthetic_avss(root: str, num_videos: int = 4, image_size: int = 64,
                        num_classes: int = 8, seed: int = 0,
                        splits=("train", "test"), ambiguous: bool = False,
                        vary_pos: bool = False) -> str:
    """Create a mini avsbench_semantic tree + metadata.csv under root.

    ``ambiguous``: classes 2k-1 and 2k share one visual tint while the
    audio tone stays per-class — the *class* of the sounding object is
    then only decidable from audio, which is the property the CoroCL
    objective-effect A/B (scripts/generalize_smoke.py) needs: a fixture
    where vision alone saturates CE would show nothing.
    ``vary_pos``: place the object square at a per-video random offset
    instead of the center, so passing on held-out videos requires
    localizing the textured square, not memorizing its position.
    """
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "avsbench_semantic")
    rows = ["split,label,uid,a_obj,s_min,s_sec"]
    subsets = ["v1s", "v1m", "v2"]
    for split in splits:
        for v in range(num_videos):
            subset = subsets[v % 3]
            uid = f"{split}_vid{v}"
            vdir = os.path.join(base, subset, uid)
            os.makedirs(os.path.join(vdir, "frames"), exist_ok=True)
            os.makedirs(os.path.join(vdir, "labels_semantic"), exist_ok=True)
            n_frames = 10 if subset == "v2" else 5
            n_masks = 10 if subset == "v2" else 5
            cls = 1 + v % (num_classes - 1)
            s = image_size // 4
            if vary_pos:
                y0 = int(rng.randint(0, image_size - 2 * s + 1))
                x0 = int(rng.randint(0, image_size - 2 * s + 1))
            else:
                y0 = x0 = s
            # ambiguous: the tint keys the class *pair* (1,2)->1,
            # (3,4)->2, ... so only the audio tone resolves the class
            tint_key = (cls + 1) // 2 if ambiguous else cls
            for i in range(n_frames):
                img = rng.randint(0, 255, (image_size, image_size, 3),
                                  dtype=np.uint8)
                # paint the sounding object: a tinted textured square
                # where the mask is — without it the mask is only
                # predictable from absolute position, which conv nets
                # can't express, and training tests can't converge
                tint = np.array([(tint_key * 53) % 200 + 55,
                                 (tint_key * 101) % 200 + 55,
                                 (tint_key * 179) % 200 + 55], np.uint8)
                region = img[y0:y0 + 2 * s, x0:x0 + 2 * s].astype(np.int32)
                img[y0:y0 + 2 * s, x0:x0 + 2 * s] = (
                    region // 4 + tint).clip(0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(vdir, "frames", f"{i}.jpg"))
            for i in range(n_masks):
                mask = np.zeros((image_size, image_size), np.uint8)
                mask[y0:y0 + 2 * s, x0:x0 + 2 * s] = cls
                Image.fromarray(mask, mode="L").save(
                    os.path.join(vdir, "labels_semantic", f"{i}.png"))
            t = np.linspace(0, 10, 160000, endpoint=False)
            tone = 0.3 * np.sin(2 * np.pi * (200 + 50 * cls) * t)
            write_wav(os.path.join(vdir, "audio.wav"),
                      tone[None].astype(np.float32))
            rows.append(f"{split},{subset},{uid},obj{cls},0,0")
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "metadata.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    return base


def synthetic_train_batch(config, batch_size: Optional[int] = None,
                          seed: int = 0) -> Dict[str, np.ndarray]:
    """In-memory random train batch with the setup's exact shapes."""
    rng = np.random.RandomState(seed)
    B = batch_size or config.batch_size
    H, W = config.image_height, config.image_width
    C = config.num_classes
    ca = config.in_plane
    batch = {
        "image": rng.randn(B, H, W, 3).astype(np.float32),
        "waveform": (rng.rand(B, ca, config.audio_samples).astype(np.float32)
                     - 0.5) * 0.2,
        "pix_label": rng.randint(0, C, (B, H, W)).astype(np.int32),
        "img_label": np.zeros((B, C), np.int32),
    }
    batch["img_label"][:, 0] = 1
    for i in range(B):
        batch["img_label"][i, 1 + i % (C - 1)] = 1
    return batch


def synthetic_eval_batch(config, num_frames: int, seed: int = 0
                         ) -> Dict[str, np.ndarray]:
    """Flat eval batch ([N frames]) with validity mask."""
    rng = np.random.RandomState(seed)
    H, W = config.image_height, config.image_width
    N = num_frames
    return {
        "image": rng.randn(N, H, W, 3).astype(np.float32),
        "waveform": (rng.rand(N, config.in_plane, config.audio_samples)
                     .astype(np.float32) - 0.5) * 0.2,
        "pix_label": rng.randint(0, config.num_classes, (N, H, W))
        .astype(np.int32),
        "valid": np.ones((N,), np.float32),
    }
