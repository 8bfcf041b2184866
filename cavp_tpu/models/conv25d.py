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
        center = dpatch[..., 4:5]

        if self.mode == "depth":
            # grid threshold ~ depth * pixel_size (one world-grid cell)
            grid = jnp.maximum(center * self.pixel_size, 1e-6)
            rel = (dpatch - center) / grid
        else:  # disparity: nearer planes have larger disparity
            grid = jnp.maximum(jnp.abs(center) * self.pixel_size, 1e-6)
            rel = (center - dpatch) / grid

        # plane masks: behind / same / front
        front = (rel < -0.5).astype(jnp.float32)
        same = (jnp.abs(rel) <= 0.5).astype(jnp.float32)
        behind = (rel > 0.5).astype(jnp.float32)
        masks = jnp.stack([front, same, behind], axis=-2)  # [B,H,W,3,9]

        kf = k.reshape(3, 9, C, self.features)
        out = jnp.einsum("bhwpn,bhwnc,pncf->bhwf",
                         masks, patches.astype(jnp.float32),
                         kf.astype(jnp.float32))
        return (out + bias).astype(x.dtype)


class Conv2_5D_depth(Conv2_5D):
    mode: str = "depth"


class Conv2_5D_disp(Conv2_5D):
    mode: str = "disp"
