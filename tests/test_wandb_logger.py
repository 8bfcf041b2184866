"""Observability display parity: palette, colorize_mask, image uploads
(vs utils/tensor_board.py:90-139,211-251 semantics)."""

import sys
import types

import numpy as np
import pytest
from PIL import Image

from cavp_tpu.config import get_config
from cavp_tpu.utils.wandb_logger import (
    Tensorboard,
    colorize_mask,
    get_display_palette,
)


def _reference_colorize(mask: np.ndarray, palette: list) -> np.ndarray:
    """tensor_board.colorize_mask:241-251 verbatim semantics via PIL."""
    palette = list(palette)
    zero_pad = 256 * 3 - len(palette)
    palette.extend([0] * zero_pad)
    palette[-3:] = [255, 255, 255]
    img = Image.fromarray(mask.astype(np.uint8)).convert("P")
    img.putpalette(palette)
    return np.asarray(img.convert("RGB"))


class TestPalette:
    def test_binary_is_black_white(self):
        assert get_display_palette(2) == [0, 0, 0, 255, 255, 255]

    def test_runner_palette_selection(self):
        """AVSS-family runs use the dataset's 71-class v2 palette (the
        reference's post-init override); VPO uses get_pallete(classes)."""
        from cavp_tpu.data.avss import get_v2_palette
        from cavp_tpu.engine.runner import select_display_palette

        avss = get_config("avss")
        assert select_display_palette(avss) == get_v2_palette(71)
        binary = get_config("avss_binary")
        assert select_display_palette(binary) == get_v2_palette(71)
        vpo = get_config("vpo_ss")
        assert select_display_palette(vpo) == get_display_palette(
            vpo.num_classes)

    def test_colorize_matches_reference_incl_ignore(self):
        pal = get_display_palette(71)
        mask = np.arange(256, dtype=np.int64).reshape(16, 16)
        ours = colorize_mask(mask, pal)
        ref = _reference_colorize(mask, pal)
        np.testing.assert_array_equal(ours, ref)
        # ignore=255 renders white
        np.testing.assert_array_equal(ours.reshape(-1, 3)[255], [255] * 3)


class _FakeWandbImage:
    def __init__(self, data, caption=None):
        self.data = np.asarray(data)
        self.caption = caption


class TestUploadImage:
    @pytest.fixture
    def board(self, monkeypatch):
        fake = types.ModuleType("wandb")
        fake.Image = _FakeWandbImage
        monkeypatch.setitem(sys.modules, "wandb", fake)
        cfg = get_config("avss").replace(num_classes=7)
        board = Tensorboard(cfg, palette=get_display_palette(7))
        logged = {}

        class FakeRun:
            def log(self, d, step=None):
                logged.update(d)

        board._wandb = FakeRun()
        return board, logged, cfg

    def test_pred_ignore_masked_and_image_denormalized(self, board):
        board, logged, cfg = board
        rng = np.random.RandomState(0)
        gt = rng.randint(0, 7, (2, 8, 8)).astype(np.int64)
        gt[:, 0, :] = 255
        logits = rng.randn(2, 8, 8, 7).astype(np.float32)
        raw = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
        mean = np.asarray(cfg.image_mean, np.float32)
        std = np.asarray(cfg.image_std, np.float32)
        norm = (raw.astype(np.float32) / 255.0 - mean) / std
        board.upload_wandb_image(norm, gt, logits, None, status="val",
                                 caption="vid")
        # pred rows where gt==255 must render white (ignore masking)
        pred_imgs = logged["val/pred"]
        for im in pred_imgs:
            np.testing.assert_array_equal(im.data[0], 255)
        # input image round-trips the normalization (to within rounding)
        img_imgs = logged["val/image"]
        assert img_imgs[0].data.dtype == np.uint8
        assert np.max(np.abs(img_imgs[0].data.astype(int) -
                             raw[0].astype(int))) <= 1
        assert img_imgs[0].caption == "vid"
        assert "val/gt" in logged
