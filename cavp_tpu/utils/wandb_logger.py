"""Observability: wandb wrapper + console logging.

Rebuilds ``utils/tensor_board.py`` (the ``Tensorboard`` wandb wrapper:
run naming ``[SETUP][bkb][BSxx][Gn]name``, ``upload_metrics``,
``upload_wandb_image`` with palette-colorized GT/pred, run summaries)
and the rank-gated loguru setup (``utils/ddp_utils.supress_printer``).
wandb is optional: disabled mode (the default) degrades to an in-memory
metric log so headless/test runs need no network.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("cavp_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def suppress_non_primary(is_primary: bool):
    """supress_printer parity: non-zero ranks log errors only."""
    logger.setLevel(logging.INFO if is_primary else logging.ERROR)


def get_display_palette(num_classes: int) -> List[int]:
    """utils/tensor_board.get_pallete:211-227 — display palette for
    colorized uploads. Binary renders foreground white; multi-class uses
    the AVSBench bit-interleave colors."""
    if num_classes == 2:
        return [0, 0, 0, 255, 255, 255]
    palette = [0] * (num_classes * 3)
    for j in range(num_classes):
        lab = j
        i = 0
        while lab > 0:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


def colorize_mask(mask: np.ndarray, palette: List[int]) -> np.ndarray:
    """utils/tensor_board.colorize_mask:241-251 — palette-index to RGB.
    The palette is zero-padded to 256 entries with the last one white, so
    ignore pixels (255) render white exactly as the reference's
    ``palette[-3:] = [255, 255, 255]`` does."""
    pal = np.zeros((256, 3), np.uint8)
    pal[:len(palette) // 3] = np.asarray(palette, np.uint8).reshape(-1, 3)
    pal[255] = 255
    return pal[np.clip(mask, 0, 255)]


def load_eval_list(path: str) -> List[str]:
    """utils/eval_list.txt loader (trainer_cavp_avss_image.py:59-60):
    video uids whitelisted for image upload during eval."""
    try:
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]
    except OSError:
        return []


class Tensorboard:
    """Same public surface as the reference class; wandb optional."""

    def __init__(self, config, palette: Optional[List[int]] = None,
                 eval_list_path: str = ""):
        self.config = config
        self.palette = palette
        self.eval_list = load_eval_list(eval_list_path) if eval_list_path \
            else []
        self.history: List[Dict] = []
        self._wandb = None
        if config.wandb_mode not in ("disabled", "", None):
            try:
                import wandb

                run_name = (f"[{config.setup.upper()}]"
                            f"[{config.visual_backbone}]"
                            f"[BS{config.batch_size}]"
                            f"[G{config.gpus}]{config.experiment_name}")
                self._wandb = wandb.init(
                    project=config.proj_name, name=run_name,
                    dir=config.wandb_dir, mode=config.wandb_mode,
                    notes=config.run_note,
                    tags=list(config.tags) or None,
                    config={k: v for k, v in vars(config).items()
                            if isinstance(v, (int, float, str, bool))})
            except Exception as e:  # wandb absent or offline failure
                logger.warning(f"wandb unavailable ({e}); metrics logged locally")
                self._wandb = None

    def upload_metrics(self, metrics: Dict, step: Optional[int] = None):
        scalar = {k: float(v) for k, v in metrics.items()
                  if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        self.history.append(scalar)
        if self._wandb is not None:
            self._wandb.log(scalar, step=step)

    def upload_wandb_image(self, image, gt, logits, probs, status="train",
                           caption=None, folder=None, heatmap=None,
                           show_y=True):
        """tensor_board.upload_wandb_image:90-139: x (denormalized
        input), y (GT), y_tilde (pred with ignore pixels masked to 255 —
        ``pred[gt == 255] = 255``), palette-colorized."""
        if self._wandb is None or self.palette is None:
            return
        import wandb

        gt = np.asarray(gt)
        pred = np.asarray(logits).argmax(-1).astype(np.int64)
        pred[gt == 255] = 255
        log = {
            f"{status}/gt": [wandb.Image(colorize_mask(g, self.palette),
                                         caption=caption) for g in gt],
            f"{status}/pred": [wandb.Image(colorize_mask(p, self.palette),
                                           caption=caption) for p in pred],
        }
        if image is not None:
            imgs = np.asarray(image)
            if imgs.dtype != np.uint8:  # normalized model input: denorm
                mean = np.asarray(self.config.image_mean, np.float32)
                std = np.asarray(self.config.image_std, np.float32)
                imgs = np.clip((imgs * std + mean) * 255.0, 0, 255
                               ).astype(np.uint8)
            log[f"{status}/image"] = [wandb.Image(im, caption=caption)
                                      for im in imgs]
        self._wandb.log(log)

    def set_summary(self, key: str, value):
        if self._wandb is not None:
            self._wandb.run.summary[key] = value

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
