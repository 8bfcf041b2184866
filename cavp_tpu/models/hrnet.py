"""HRNet-W48 backbone + HRNetV2 segmentation head, flax/NHWC.

Rebuilds ``models/visual/backbones/hrnet/hrnet.py`` (HighResolutionNet
with the HRNET_48 config: stem of two stride-2 3x3 convs, layer1 = 4x
Bottleneck(64), stages 2/3/4 with [1,4,3] modules of 4x BasicBlock
branches at [48,96,192,384] channels, SUM fusion with 1x1-conv +
bilinear(align_corners=True) upsample / strided-3x3 downsample paths)
and ``models/visual/hrnet/hrnetv2_w48.py`` (the 720-channel concat head
with conv3x3 + dropout + bias-free 1x1 classifier).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import BatchNorm, Conv
from cavp_tpu.ops.interp import interpolate_bilinear

W48_CHANNELS = (48, 96, 192, 384)
STAGE_MODULES = (1, 4, 3)  # stages 2, 3, 4
BLOCKS_PER_BRANCH = 4


class _Basic(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                 name=n)
        residual = x
        out = Conv(self.planes, 3, strides=self.stride, padding=1,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = Conv(self.planes, 3, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out, not train)
        if self.downsample:
            residual = Conv(self.planes, 1, strides=self.stride,
                            use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(out + residual)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                 name=n)
        residual = x
        out = Conv(self.planes, 1, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = Conv(self.planes, 3, strides=self.stride, padding=1,
                   use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out, not train))
        out = Conv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = bn("bn3")(out, not train)
        if self.downsample:
            residual = Conv(self.planes * 4, 1, strides=self.stride,
                            use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(out + residual)


class _HRModule(nn.Module):
    """hrnet.py:103-278 — parallel branches + SUM fusion."""

    num_branches: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool):
        bn = lambda n: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                 name=n)
        nb = self.num_branches
        # branches
        ys = []
        for i in range(nb):
            h = xs[i]
            for b in range(BLOCKS_PER_BRANCH):
                h = _Basic(planes=W48_CHANNELS[i], axis_name=self.axis_name,
                           dtype=self.dtype, name=f"branch{i}_block{b}")(
                    h, train)
            ys.append(h)
        # fusion
        out = []
        for i in range(nb):
            y = None
            for j in range(nb):
                if j == i:
                    t = ys[j]
                elif j > i:
                    t = Conv(W48_CHANNELS[i], 1, use_bias=False,
                             dtype=self.dtype, name=f"fuse{i}_{j}_conv")(ys[j])
                    t = bn(f"fuse{i}_{j}_bn")(t, not train)
                    t = interpolate_bilinear(
                        t, (ys[i].shape[1], ys[i].shape[2]),
                        align_corners=True)
                else:  # j < i: (i-j) strided 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = W48_CHANNELS[i] if last else W48_CHANNELS[j]
                        t = Conv(ch, 3, strides=2, padding=1, use_bias=False,
                                 dtype=self.dtype,
                                 name=f"fuse{i}_{j}_conv{k}")(t)
                        t = bn(f"fuse{i}_{j}_bn{k}")(t, not train)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            out.append(nn.relu(y))
        return out


class HRNetW48Backbone(nn.Module):
    """HighResolutionNet (hrnet.py:287-646): returns the 4 branch maps."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                 name=n)
        x = Conv(64, 3, strides=2, padding=1, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x, not train))
        x = Conv(64, 3, strides=2, padding=1, use_bias=False,
                 dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x, not train))

        # layer1: 4x Bottleneck(64) -> 256 channels
        for b in range(4):
            x = _Bottleneck(planes=64, downsample=(b == 0),
                            axis_name=self.axis_name, dtype=self.dtype,
                            name=f"layer1_{b}")(x, train)

        # transitions + stages
        branches = [x]
        for stage_idx, (n_branches, n_modules) in enumerate(
                zip((2, 3, 4), STAGE_MODULES)):
            new_branches = []
            for i in range(n_branches):
                if i < len(branches):
                    src = branches[i]
                    # channel-adapting 3x3 when widths differ
                    if src.shape[-1] != W48_CHANNELS[i]:
                        t = Conv(W48_CHANNELS[i], 3, padding=1, use_bias=False,
                                 dtype=self.dtype,
                                 name=f"transition{stage_idx + 1}_{i}_conv")(src)
                        t = nn.relu(bn(
                            f"transition{stage_idx + 1}_{i}_bn")(t, not train))
                        new_branches.append(t)
                    else:
                        new_branches.append(src)
                else:
                    t = Conv(W48_CHANNELS[i], 3, strides=2, padding=1,
                             use_bias=False, dtype=self.dtype,
                             name=f"transition{stage_idx + 1}_{i}_conv")(
                        branches[-1])
                    t = nn.relu(bn(
                        f"transition{stage_idx + 1}_{i}_bn")(t, not train))
                    new_branches.append(t)
            branches = new_branches
            for m in range(n_modules):
                branches = _HRModule(
                    num_branches=n_branches, axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"stage{stage_idx + 2}_module{m}")(branches, train)
        return branches


class HRNetW48Head(nn.Module):
    """hrnetv2_w48.HRNet_W48: concat 4 upsampled branches (720ch) ->
    conv3x3+BN+ReLU (dropout 0.1, inert at eval) -> bias-free 1x1
    classifier. ``forward_feature`` yields the 720-ch fusion map for
    cross-attention (latent_dim=720, cavp_model.py:99-101)."""

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.last_conv = Conv(720, 3, padding=1, use_bias=True,
                              dtype=self.dtype)
        self.last_bn = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)
        # hrnetv2_w48.py:22 Dropout2d(0.10): drops whole channels —
        # broadcast over the NHWC spatial dims
        self.drop = nn.Dropout(0.10, broadcast_dims=(1, 2))
        self.classifier = Conv(self.num_classes, 1, use_bias=False,
                               dtype=self.dtype)

    def forward_feature(self, feats, train: bool):
        h, w = feats[0].shape[1:3]
        ups = [feats[0]] + [
            interpolate_bilinear(f, (h, w), align_corners=True)
            for f in feats[1:]]
        return jnp.concatenate(ups, axis=-1)

    def upsample(self, x, train: bool):
        f = self.last_conv(x)
        f = nn.relu(self.last_bn(f, not train))
        f = self.drop(f, deterministic=not train)
        return self.classifier(f)

    def __call__(self, feats, train: bool = False):
        return self.upsample(self.forward_feature(feats, train), train)
