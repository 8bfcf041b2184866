"""Depth-aware 2.5D convolutions.

Rebuilds ``utils/conv_2_5d.py:24-193`` (``Conv2_5D_depth`` /
``Conv2_5D_disp``): a 3x3 conv whose kernel is selected per-pixel among
three depth planes by comparing neighborhood depth (or disparity)
against the center pixel within a depth-dependent grid threshold. In
the reference these exist only as ``group_weight`` isinstance targets;
implemented here for capability parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import kaiming_uniform


def _unfold3x3(x):
    """[B, H, W, C] -> [B, H, W, 9, C] 3x3 neighborhoods (zero pad)."""
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(3, 3), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, H, W, _ = patches.shape
    C = x.shape[-1]
    # patches layout: [C, 9] interleaved as C*9 (channel-major)
    return patches.reshape(B, H, W, C, 9).transpose(0, 1, 2, 4, 3)


class Conv2_5D(nn.Module):
    """Shared core; ``mode`` selects depth vs disparity plane logic."""

    features: int
    pixel_size: float = 1.0
    mode: str = "depth"  # "depth" | "disp"
    camera_params: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, depth, camera_params=None):
        B, H, W, C = x.shape
        k = self.param("kernel", kaiming_uniform(),
                       (3, 3, 3, C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        patches = _unfold3x3(x)                       # [B,H,W,9,C]
        dpatch = _unfold3x3(depth[..., None])[..., 0]  # [B,H,W,9]

        def _bcast(v):  # camera scalar (or per-sample [B]) -> [B,1,1,1]
            return jnp.asarray(v, jnp.float32).reshape(-1, 1, 1, 1)

        cp = camera_params or self.camera_params or {}

        def _cam(group, key, default):
            try:
                return cp[group][key]
            except (KeyError, TypeError, IndexError):
                return default

        fx = _bcast(_cam("intrinsic", "fx", 1.0))

        valid = None
        if self.mode == "disp":
            # conv_2_5d.py:66-80: zero disparity is invalid (forced onto
            # the center plane below); disparity -> metric depth via
            # baseline*fx / clamp(disp, 0.01, 256)
            baseline = _bcast(_cam("extrinsic", "baseline", 1.0))
            valid = (dpatch != 0).astype(jnp.float32)
            valid = valid * valid[..., 4:5]
            depth_m = (baseline * fx) / jnp.clip(dpatch * valid, 0.01, 256.0)
            center = depth_m[..., 4:5]
            grid = self.pixel_size * center / fx  # dilation=1 (3x3 here)
        else:
            # conv_2_5d.py:163-171
            depth_m = dpatch
            center = dpatch[..., 4:5]
            grid = self.pixel_size * center / fx

        # Three BOUNDED bands, one grid cell apart: |d - (c±g)| <= g/2
        # and |d - c| <= g/2. Taps outside every band contribute to NO
        # plane (unlike half-spaces, which would always assign one).
        mask0 = (jnp.abs(depth_m - (center + grid)) <= grid / 2)
        mask1 = (jnp.abs(depth_m - center) <= grid / 2)
        mask2 = (jnp.abs(depth_m - (center - grid)) <= grid / 2)
        mask0 = mask0.astype(jnp.float32)
        mask1 = mask1.astype(jnp.float32)
        mask2 = mask2.astype(jnp.float32)
        if valid is not None:
            # invalid taps default to the center plane (conv_2_5d.py:80)
            mask1 = jnp.clip(mask1 + 1.0 - valid, 0.0, 1.0)
        # plane order matches the reference's weight_0/1/2
        masks = jnp.stack([mask0, mask1, mask2], axis=-2)  # [B,H,W,3,9]

        kf = k.reshape(3, 9, C, self.features)
        out = jnp.einsum("bhwpn,bhwnc,pncf->bhwf",
                         masks, patches.astype(jnp.float32),
                         kf.astype(jnp.float32))
        return (out + bias).astype(x.dtype)


class Conv2_5D_depth(Conv2_5D):
    mode: str = "depth"  # reference default pixel_size=1 (conv_2_5d.py:109)


class Conv2_5D_disp(Conv2_5D):
    mode: str = "disp"
    pixel_size: float = 16.0  # reference default (conv_2_5d.py:26)
