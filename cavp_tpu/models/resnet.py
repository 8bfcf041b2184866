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
    """Deep-stem ResNet returning [c1, c2, c3, c4] stage features.

    setup()-style (round 4) so the eval path can enter/exit at stage
    boundaries — ``stem_forward`` + ``forward_from_c1`` bracket layer1
    for the fused Pallas residual-stage kernel
    (:mod:`cavp_tpu.ops.pallas.layer1_kernel`). Attribute names are
    chosen so the param/batch_stats tree is byte-identical to the
    previous @nn.compact layout (``stem_conv1``.., ``layer{s}_{b}``).
    """

    depth: int = 50
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    nostride_dilate_layer4: bool = True
    stem_width: int = 64
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        sw = self.stem_width
        bn = lambda: BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_eps,
                               axis_name=self.axis_name, dtype=self.dtype)
        conv = lambda f, s: Conv(f, 3, strides=s, padding=1, use_bias=False,
                                 dtype=self.dtype)
        # deep stem (resnet.py:107-121): convs are stem.0/stem.3/stem.6 in torch
        self.stem_conv1 = conv(sw, 2)
        self.stem_bn1 = bn()
        self.stem_conv2 = conv(sw, 1)
        self.stem_bn2 = bn()
        self.stem_conv3 = conv(sw * 2, 1)
        self.bn1 = bn()

        layers = RESNET_LAYERS[self.depth]
        specs = stage_specs(layers, self.replace_stride_with_dilation,
                            self.nostride_dilate_layer4)
        for stage_idx, stage in enumerate(specs):
            planes = (64, 128, 256, 512)[stage_idx]
            blocks = [
                Bottleneck(
                    planes=planes,
                    stride=spec["stride"],
                    dilation=spec["dilation"],
                    downsample=spec["downsample"],
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                )
                for spec in stage
            ]
            # attribute name "layer<k>" -> flax names them layer<k>_<i>,
            # matching the old compact layout's explicit names.
            setattr(self, f"layer{stage_idx + 1}", blocks)

    def stem_forward(self, x, train: bool = False):
        """Deep stem + maxpool: [B,H,W,3] -> [B,H/4,W/4,2*stem_width]."""
        x = self.stem_conv1(x)
        x = self.stem_bn1(x, not train)
        x = nn.relu(x)
        x = self.stem_conv2(x)
        x = self.stem_bn2(x, not train)
        x = nn.relu(x)
        x = self.stem_conv3(x)
        x = self.bn1(x, not train)
        x = nn.relu(x)
        return max_pool(x, 3, 2, 1)

    def forward_from_c1(self, c1, train: bool = False):
        """Stages 2..4 given the layer1 output; returns [c1, c2, c3, c4]."""
        feats = [c1]
        x = c1
        for stage in (self.layer2, self.layer3, self.layer4):
            for block in stage:
                x = block(x, train)
            feats.append(x)
        return feats

    def __call__(self, x, train: bool = False):
        x = self.stem_forward(x, train)
        for block in self.layer1:
            x = block(x, train)
        return self.forward_from_c1(x, train)
