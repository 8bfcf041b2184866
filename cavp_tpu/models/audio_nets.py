"""Audio encoder towers, flax/NHWC.

Rebuilds ``models/audio/audio_network.py:9-45`` and
``models/audio/backbones/vgg.py``:

- :class:`VGGAudio`: VGGish conv stack [64,M,128,M,256,256,M,512,512,M]
  on 1-channel log-mel [N,96,64,1], flattened in (H,W,C) order (the
  torch double-transpose at vgg.py:18-22 produces exactly NHWC flatten
  order) into a 3-layer MLP 12288->4096->4096->out with ReLU after every
  linear (vgg.py:9-15). Used for 1 s audio (AVSS/AVSBench setups).
- :class:`AudioResNet18`: torchvision-style BasicBlock ResNet-18 with an
  ``in_plane``-channel stem, AdaptiveMaxPool head and Linear(512, out)
  (audio_network.py:19-25). Used for 3 s audio (VPO setups, stereo via
  in_plane=2).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import BatchNorm, Conv, Dense, global_max_pool, max_pool


class VGGAudio(nn.Module):
    """vgg.py:5-36 — features + embeddings."""

    out_plane: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [N, 96, 64, 1] log-mel (NHWC)
        idx = 0
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
            if v == "M":
                x = max_pool(x, 2, 2, 0)
            else:
                x = Conv(v, 3, padding=1, use_bias=True, dtype=self.dtype,
                         name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
        # [N, 6, 4, 512] -> flatten in (H, W, C) order == NHWC flatten
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(Dense(4096, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(Dense(self.out_plane, dtype=self.dtype, name="fc2")(x))
        return x


class _BasicBlock(nn.Module):
    """torchvision BasicBlock (3x3 + 3x3), used only by the audio tower."""

    planes: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        residual = x
        out = Conv(self.planes, 3, strides=self.stride, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out, not train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, padding=1, use_bias=False, dtype=self.dtype,
                   name="conv2")(out)
        out = bn("bn2")(out, not train)
        if self.downsample:
            residual = Conv(self.planes, 1, strides=self.stride, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(out + residual)


class AudioResNet18(nn.Module):
    """audio_network.py:19-25 — torchvision resnet18, multi-channel stem,
    global max-pool head, Linear(512, out_plane)."""

    out_plane: int
    in_plane: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [N, T, 64, in_plane]
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        x = Conv(64, 7, strides=2, padding=3, use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        x = bn("bn1")(x, not train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        for stage_idx, (planes, blocks, stride) in enumerate(
            ((64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2))
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or x.shape[-1] != planes)
                x = _BasicBlock(planes=planes, stride=s, downsample=down,
                                axis_name=self.axis_name, dtype=self.dtype,
                                name=f"layer{stage_idx + 1}_{b}")(x, train)
        x = global_max_pool(x).reshape(x.shape[0], -1)
        return Dense(self.out_plane, dtype=self.dtype, name="fc")(x)


class AudioModel(nn.Module):
    """audio_network.py:9-34 — backbone dispatch + (unused) cls head.

    The ``cls_head`` Linear(out, num_classes) exists in the reference but
    ``forward`` never uses it; kept for checkpoint parity.
    """

    backbone: str = "vgg"  # "vgg" | "18"
    out_plane: int = 304
    in_plane: int = 1
    num_classes: int = 2
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone == "vgg":
            self.net = VGGAudio(out_plane=self.out_plane, dtype=self.dtype)
        else:
            self.net = AudioResNet18(out_plane=self.out_plane,
                                     in_plane=self.in_plane,
                                     axis_name=self.axis_name, dtype=self.dtype)
        self.cls_head = Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        out = self.net(x, train)
        if self.is_initializing():
            # Materialize the (forward-unused) cls_head params so torch
            # checkpoints convert 1:1 with no unexpected keys.
            _ = self.cls_head(out)
        return out

    def forward_cls(self, x, train: bool = False):
        return self.cls_head(self.net(x, train))
