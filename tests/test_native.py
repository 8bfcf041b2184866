"""Native host-IO core vs PIL reference."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from cavp_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_files():
    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    jpg = os.path.join(tmp, "a.jpg")
    Image.fromarray(img).save(jpg, quality=95)
    mask = rng.randint(0, 7, (96, 128), dtype=np.uint8)
    png = os.path.join(tmp, "m.png")
    Image.fromarray(mask, mode="L").save(png)
    return jpg, png, mask


class TestNativeDecode:
    def test_image_matches_pil(self, image_files):
        jpg, _, _ = image_files
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        ours = native.decode_image(jpg, 64, 64, mean, std)

        pil = Image.open(jpg).convert("RGB").resize((64, 64), Image.BICUBIC)
        ref = (np.asarray(pil, np.float32) / 255.0 - mean) / std
        # JPEG decode differences + resampler rounding: close, not exact
        assert ours.shape == ref.shape
        diff = np.abs(ours - ref)
        assert np.percentile(diff, 95) < 0.12, np.percentile(diff, 95)

    def test_mask_nearest_close_to_pil(self, image_files):
        """PIL's NEAREST picks neighbors via a float affine whose exact
        integer-boundary behavior is rounding-noise dependent; the native
        center-rule matches everywhere except those boundary pixels."""
        _, png, mask = image_files
        ours = native.decode_mask(png, 48, 48)
        pil = np.asarray(Image.open(png).resize((48, 48), Image.NEAREST),
                         np.int32)
        mismatch = float((ours != pil).mean())
        assert mismatch < 0.15, mismatch
        # identity resize is exact
        same = native.decode_mask(png, *mask.shape)
        np.testing.assert_array_equal(same, mask)

    def test_batch(self, image_files):
        jpg, png, _ = image_files
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        out = native.decode_image_batch([jpg] * 4, 32, 32, mean, std,
                                        n_threads=2)
        assert out.shape == (4, 32, 32, 3)
        np.testing.assert_array_equal(out[0], out[3])
        masks = native.decode_mask_batch([png] * 3, 24, 24, n_threads=2)
        assert masks.shape == (3, 24, 24)


class TestNativeRawDecode:
    """decode_raw (the TRAIN-path decode, VERDICT r2 #3): source-dims
    uint8 arrays, exact vs PIL for PNG and byte-exact for JPEG (same
    libjpeg), including palette-index and 1-bit semantics."""

    def test_raw_rgb_matches_pil(self, image_files):
        jpg, _, _ = image_files
        ours = native.decode_raw(jpg)
        ref = np.asarray(Image.open(jpg).convert("RGB"))
        np.testing.assert_array_equal(ours, ref)

    def test_raw_mask_indices(self, image_files):
        _, png, mask = image_files
        ours = native.decode_raw(png, as_gray=True)[:, :, 0]
        np.testing.assert_array_equal(ours, mask)

    def test_raw_palette_and_1bit(self, tmp_path):
        pal = np.zeros((40, 60), np.uint8)
        pal[5:20, 10:30] = 7
        pimg = Image.fromarray(pal, "P")
        pimg.putpalette([i for i in range(256) for _ in range(3)])
        p = str(tmp_path / "p.png")
        pimg.save(p)
        np.testing.assert_array_equal(
            native.decode_raw(p, as_gray=True)[:, :, 0], pal)

        binary = (np.arange(40 * 60).reshape(40, 60) % 3 == 0)
        b = str(tmp_path / "b.png")
        Image.fromarray(binary.astype(np.uint8) * 255).convert("1").save(b)
        np.testing.assert_array_equal(
            native.decode_raw(b, as_gray=True)[:, :, 0],
            binary.astype(np.uint8))

    def test_oversize_retry(self, tmp_path):
        rng = np.random.RandomState(1)
        big = rng.randint(0, 255, (128, 128, 3), np.uint8)
        p = str(tmp_path / "big.png")
        Image.fromarray(big).save(p)
        out = native.decode_raw(p, initial_cap=16)  # force the retry
        np.testing.assert_array_equal(out, big)

    def test_train_aug_identical_to_pil(self, image_files, tmp_path):
        """native_open_pair + train augmentation == PIL path bit-for-bit
        when driven with the same Python RNG state (decode is exact, the
        augmentation code is shared)."""
        import random

        from cavp_tpu.data.transforms import VisualAugmentation

        jpg, png, _ = image_files
        tf = VisualAugmentation(
            image_mean=[0.485, 0.456, 0.406], image_std=[0.229, 0.224, 0.225],
            image_width=64, image_height=64, mode="train", setup="avss",
            resize_flag=True)

        pair = tf.native_open_pair(jpg, png)
        assert pair is not None
        random.seed(123)
        xn, yn = tf(*pair)
        random.seed(123)
        xp, yp = tf(Image.open(jpg).convert("RGB"), Image.open(png))
        np.testing.assert_array_equal(xn, xp)
        np.testing.assert_array_equal(yn, yp)

    def test_binary_mask_guard_rejects_nonbinary(self, image_files):
        _, png, _ = image_files  # values 0..6 -> not binary
        assert VisualAugmentationGuard(png)


def VisualAugmentationGuard(png):
    from cavp_tpu.data.transforms import VisualAugmentation

    return VisualAugmentation.native_open_binary_mask(png) is None


def test_binary_guard_rejects_8bit_01_mask(tmp_path):
    """An 8-bit gray PNG whose values are {0,1} must NOT take the native
    binary path: PIL's convert('1') thresholds at 128 (dither), mapping
    it to ~zeros — the reference behavior — while the raw indices would
    stay binary. The guard is the header mode, not the value range."""
    from cavp_tpu.data.transforms import VisualAugmentation

    m = (np.arange(30 * 40).reshape(30, 40) % 2).astype(np.uint8)  # {0,1}
    p = str(tmp_path / "gray01.png")
    Image.fromarray(m, mode="L").save(p)
    assert VisualAugmentation.native_open_binary_mask(p) is None
    # true 1-bit files still take the native path
    b = str(tmp_path / "bit1.png")
    Image.fromarray((m * 255)).convert("1").save(b)
    lab = VisualAugmentation.native_open_binary_mask(b)
    assert lab is not None
    np.testing.assert_array_equal(np.asarray(lab), m)
