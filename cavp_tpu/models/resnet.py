"""Deep-stem ResNet backbone (segmentation flavor), flax/NHWC.

Rebuilds ``models/visual/backbones/resnet.py`` + the layer4 dilation
surgery of ``models/visual/deeplabv3/encoder_decoder.py:40-55``
(``_nostride_dilate``). Instead of mutating built modules, the
per-block (stride, dilation, downsample-stride) schedule is computed
statically up front with identical semantics:

- all variants use Bottleneck blocks (the reference's "resnet18" is
  Bottleneck [2,2,2,2] — resnet.py:204-205);
- deep stem: 3x(3x3) convs 3->64->64->128, stride 2 on the first
  (resnet.py:107-121), then maxpool 3x3/2;
- ``replace_stride_with_dilation`` converts a stage's stride to
  dilation (resnet.py:159-166);
- the encoder-decoder wrapper then applies ``_nostride_dilate`` with
  dilate=2,4,8,... over layer4's blocks: every stride-2 conv (incl. the
  1x1 downsample) becomes stride 1, and every 3x3 conv in block i gets
  dilation 2*2**i.

Returns the 4 stage feature maps (resnet.py:186-201).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import BatchNorm, Conv, max_pool

EXPANSION = 4

RESNET_LAYERS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def stage_specs(
    layers: Sequence[int],
    replace_stride_with_dilation: Sequence[bool],
    nostride_dilate_layer4: bool = True,
) -> List[List[dict]]:
    """Replicates the torch constructor + surgery, returning for each
    stage a list of block dicts {stride, dilation, downsample}."""
    rswd = list(replace_stride_with_dilation)
    dilation = 1
    inplanes = 128  # deep stem output
    specs: List[List[dict]] = []
    for stage_idx, (planes, blocks) in enumerate(
        zip((64, 128, 256, 512), layers)
    ):
        stride = 1 if stage_idx == 0 else 2
        dilate = False if stage_idx == 0 else rswd[stage_idx - 1]
        previous_dilation = dilation
        if dilate:
            dilation *= stride
            stride = 1
        stage = []
        for b in range(blocks):
            if b == 0:
                needs_down = stride != 1 or inplanes != planes * EXPANSION
                stage.append(dict(stride=stride, dilation=previous_dilation,
                                  downsample=stride if needs_down else None))
                inplanes = planes * EXPANSION
            else:
                stage.append(dict(stride=1, dilation=dilation, downsample=None))
        specs.append(stage)

    if nostride_dilate_layer4:
        dilate = 2
        for block in specs[3]:
            if block["stride"] == 2:
                block["stride"] = 1
                if block["downsample"] == 2:
                    block["downsample"] = 1
            block["dilation"] = dilate
            dilate *= 2
    return specs


class Bottleneck(nn.Module):
    """resnet.py:53-98. 1x1 -> 3x3(stride, dilation) -> 1x1 x4 + residual."""

    planes: int
    stride: int
    dilation: int
    downsample: Optional[int]
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_eps,
                                    axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        residual = x
        out = Conv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out, not train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, strides=self.stride, padding=self.dilation,
                   dilation=self.dilation, use_bias=False, dtype=self.dtype,
                   name="conv2")(out)
        out = bn("bn2")(out, not train)
        out = nn.relu(out)
        out = Conv(self.planes * EXPANSION, 1, use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = bn("bn3")(out, not train)
        if self.downsample is not None:
            residual = Conv(self.planes * EXPANSION, 1, strides=self.downsample,
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Deep-stem ResNet returning [c1, c2, c3, c4] stage features."""

    depth: int = 50
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    nostride_dilate_layer4: bool = True
    stem_width: int = 64
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sw = self.stem_width
        bn = lambda name: BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_eps,
                                    axis_name=self.axis_name, dtype=self.dtype,
                                    name=name)
        # deep stem (resnet.py:107-121): convs are stem.0/stem.3/stem.6 in torch
        x = Conv(sw, 3, strides=2, padding=1, use_bias=False, dtype=self.dtype,
                 name="stem_conv1")(x)
        x = bn("stem_bn1")(x, not train)
        x = nn.relu(x)
        x = Conv(sw, 3, strides=1, padding=1, use_bias=False, dtype=self.dtype,
                 name="stem_conv2")(x)
        x = bn("stem_bn2")(x, not train)
        x = nn.relu(x)
        x = Conv(sw * 2, 3, strides=1, padding=1, use_bias=False, dtype=self.dtype,
                 name="stem_conv3")(x)
        x = bn("bn1")(x, not train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        layers = RESNET_LAYERS[self.depth]
        specs = stage_specs(layers, self.replace_stride_with_dilation,
                            self.nostride_dilate_layer4)
        feats = []
        for stage_idx, stage in enumerate(specs):
            planes = (64, 128, 256, 512)[stage_idx]
            for block_idx, spec in enumerate(stage):
                x = Bottleneck(
                    planes=planes,
                    stride=spec["stride"],
                    dilation=spec["dilation"],
                    downsample=spec["downsample"],
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            feats.append(x)
        return feats
