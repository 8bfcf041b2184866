"""Mask dumping and visualization utilities.

Rebuilds ``utils/avsbench_utils.py:307-356`` (``save_mask`` binary PNG
dumps, ``save_raw_img_mask`` overlay renders) and the palette/grid
helpers from ``utils/tensor_board.py`` — numpy/PIL only.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from cavp_tpu.utils.wandb_logger import colorize_mask


def save_mask(pred_masks: np.ndarray, save_base_path: str,
              video_name_list: Sequence[str], frames_per_video: int = 5):
    """avsbench_utils.save_mask: sigmoid>0.5 binary masks -> per-video
    ``%s_%d.png`` files. pred_masks: [bs*frames, H, W] logits or probs."""
    os.makedirs(save_base_path, exist_ok=True)
    masks = np.asarray(pred_masks)
    if masks.ndim == 4:
        masks = masks.squeeze(1)
    probs = 1.0 / (1.0 + np.exp(-masks))
    binary = (probs > 0.5).astype(np.uint8) * 255
    binary = binary.reshape(-1, frames_per_video, *binary.shape[-2:])
    for idx, video_name in enumerate(video_name_list):
        vdir = os.path.join(save_base_path, video_name)
        os.makedirs(vdir, exist_ok=True)
        for fid in range(frames_per_video):
            Image.fromarray(binary[idx, fid]).convert("P").save(
                os.path.join(vdir, f"{video_name}_{fid}.png"), format="PNG")


def save_raw_img_mask(raw_img: np.ndarray, mask: np.ndarray, out_path: str,
                      palette: Optional[List[int]] = None, ratio: float = 0.5):
    """avsbench_utils.save_raw_img_mask: blend mask over the raw frame.

    raw_img: [H, W, 3] uint8; mask: [H, W] class indices (colorized via
    palette) or [H, W, 3] RGB.
    """
    img = np.asarray(raw_img).astype(np.float32)
    m = np.asarray(mask)
    if m.ndim == 2:
        if palette is None:
            m = np.stack([m * 255] * 3, axis=-1).astype(np.float32)
        else:
            m = colorize_mask(m.astype(np.int64), palette).astype(np.float32)
    blended = np.clip(img + ratio * m, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(blended).save(out_path)
    return blended


def pil_image_grid(images: Sequence[Image.Image], rows: int, cols: int
                   ) -> Image.Image:
    """tensor_board.pil_image_grid: tile PIL images into one grid."""
    w, h = images[0].size
    grid = Image.new("RGB", (cols * w, rows * h))
    for i, img in enumerate(images[:rows * cols]):
        grid.paste(img, ((i % cols) * w, (i // cols) * h))
    return grid


def format_metric_table(metrics: dict, title: str = "") -> str:
    """Console metric table (the AsciiTable reports of
    engine/utils.py:425-480), dependency-free."""
    keys = list(metrics)
    vals = [f"{metrics[k]:.4f}" if isinstance(metrics[k], float)
            else str(metrics[k]) for k in keys]
    widths = [max(len(k), len(v)) for k, v in zip(keys, vals)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    head = "|" + "|".join(f" {k:<{w}} " for k, w in zip(keys, widths)) + "|"
    row = "|" + "|".join(f" {v:<{w}} " for v, w in zip(vals, widths)) + "|"
    lines = [sep, head, sep, row, sep]
    if title:
        lines.insert(0, title)
    return "\n".join(lines)
