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
