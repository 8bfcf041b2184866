"""DeepLabV3+ segmentation head, flax/NHWC.

Rebuilds ``models/visual/deeplabv3/encoder_decoder.py:62-164``:
ASPP with rates [6,12,18] + global-pool branch (LeakyReLU activations,
``ASPP.forward:137-156``), a 48-channel low-level reduce, the
``forward_feature`` concat producing the 304-channel (or 112 for small
ASPP) fusion feature at 1/4 resolution, and the two-conv ``Upsampling``
classifier head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import BatchNorm, Conv, ConvKernel
from cavp_tpu.ops import dilated
from cavp_tpu.ops.interp import interpolate_bilinear


class ASPP(nn.Module):
    """encoder_decoder.py:112-164 (dilation rates passed as [6,12,18])."""

    out_channels: int = 256
    hidden_channels: int = 256
    dilation_rates: tuple = (6, 12, 18)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        h = self.hidden_channels
        rates = self.dilation_rates
        ci = x.shape[-1]
        dtype = self.dtype or x.dtype
        # kernels held directly (same param paths a Conv child creates)
        # so the four branch centers can merge into ONE matmul over a
        # single read of x when the tap decomposition is active
        w1x1 = ConvKernel((1, 1, ci, h), name="map_conv0")().astype(dtype)
        w3x3s = [ConvKernel((3, 3, ci, h), name=f"map_conv{i + 1}")()
                 .astype(dtype) for i in range(3)]
        xd = x.astype(dtype)
        if dilated.ENABLED and dilated.should_decompose(
                x.shape[1], x.shape[2], (min(rates),) * 2):
            out = dilated.aspp_branches(xd, w1x1, w3x3s, rates)
        else:
            def plain(w, r):
                return jax.lax.conv_general_dilated(
                    xd, w, window_strides=(1, 1), padding=((r, r), (r, r)),
                    rhs_dilation=(max(r, 1),) * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            branches = [plain(w1x1, 0)]
            for w, r in zip(w3x3s, rates):
                if dilated.ENABLED and dilated.should_decompose(
                        x.shape[1], x.shape[2], (r, r)):
                    branches.append(dilated.conv3x3_dilated_taps(xd, w, (r, r)))
                else:
                    branches.append(plain(w, r))
            out = jnp.concatenate(branches, axis=-1)
        out = bn("map_bn")(out, not train)
        out = nn.leaky_relu(out, 0.01)
        out = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="red_conv")(out)

        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = Conv(h, 1, use_bias=False, dtype=self.dtype,
                    name="global_pooling_conv")(pool)
        pool = bn("global_pooling_bn")(pool, not train)
        pool = nn.leaky_relu(pool, 0.01)
        pool = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                    name="pool_red_conv")(pool)

        out = out + pool  # broadcast over H, W (reference repeats explicitly)
        out = bn("red_bn")(out, not train)
        return nn.leaky_relu(out, 0.01)


class Upsampling(nn.Module):
    """encoder_decoder.py:62-75: 2x(conv3x3+BN+ReLU) then 1x1 classifier."""

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        f = Conv(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="last_conv0")(x)
        f = bn("last_bn0")(f, not train)
        f = nn.relu(f)
        f = Conv(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="last_conv1")(f)
        f = bn("last_bn1")(f, not train)
        f = nn.relu(f)
        return Conv(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                    name="classifier")(f)


class DeepLabV3Plus(nn.Module):
    """encoder_decoder.py:78-109. ``forward_feature`` returns the
    304-channel (ASPP 256 ‖ reduced low-level 48) fusion feature at the
    low-level (1/4) resolution, upsampled with align_corners=True."""

    num_classes: int
    aspp_out_plane: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        # hidden_channels stays at the reference's default 256 for EVERY
        # variant — encoder_decoder.py:82 never passes it, so even the
        # aspp_out_plane=64 paths (PVT, resnet18) run 256-wide branches
        self.aspp = ASPP(out_channels=self.aspp_out_plane,
                         axis_name=self.axis_name, dtype=self.dtype)
        self.reduce_conv = Conv(48, 1, use_bias=False, dtype=self.dtype)
        self.reduce_bn = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)
        self.upsample = Upsampling(num_classes=self.num_classes,
                                   axis_name=self.axis_name, dtype=self.dtype)

    def forward_feature(self, f_list, train: bool):
        f = self.aspp(f_list[-1], train)
        low = f_list[0]
        low = self.reduce_conv(low)
        low = self.reduce_bn(low, not train)
        low = nn.relu(low)
        f = interpolate_bilinear(f, (low.shape[1], low.shape[2]),
                                 align_corners=True)
        return jnp.concatenate([f, low], axis=-1)

    def __call__(self, f_list, train: bool = False):
        f = self.forward_feature(f_list, train)
        return self.upsample(f, train)
