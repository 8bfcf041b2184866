"""Complete inline plain-torch CAVP replica for full-model parity tests.

The reference package itself cannot be imported here (timm/loguru/
easydict missing), so this module re-creates the *assembled* CAVP
system — deep-stem ResNet-50/101 + ``_nostride_dilate`` layer4 surgery
(models/visual/deeplabv3/encoder_decoder.py:40-55) + ASPP/DeepLabV3+
(encoder_decoder.py:62-164) + sigmoid cross-attention
(models/attn.py:41-245) + Mlp visual projector + VGG audio tower
(models/audio/backbones/vgg.py) — in plain torch, with **module names
identical to the reference state_dict** so the repo's converter
(cavp_tpu/engine/convert.py) can be exercised end-to-end in both
directions against random weights.

This is the stand-in for the released ``.pth`` checkpoints (absent in
this environment): if any composition detail — interp align_corners, BN
placement, stem naming, flatten order, shared-vs-separate norms —
differs between this replica and the flax rebuild, the logit comparison
fails.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Vendored trivial timm bits (DropPath at rate 0 is Identity; Mlp is
# Linear -> GELU -> Linear with dropout 0).
class TimmMlp(nn.Module):
    def __init__(self, in_features, hidden_features, out_features):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


# ---------------------------------------------------------------------------
# Deep-stem ResNet (models/visual/backbones/resnet.py:53-201)
class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class DeepStemResNet(nn.Module):
    """resnet.py:101-201 with deep_stem=True, stem_width=64."""

    def __init__(self, layers, replace_stride_with_dilation):
        super().__init__()
        self.inplanes = 128
        self.dilation = 1
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.Conv2d(64, 64, 3, stride=1, padding=1, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            nn.Conv2d(64, 128, 3, stride=1, padding=1, bias=False),
        )
        self.bn1 = nn.BatchNorm2d(128)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        rswd = replace_stride_with_dilation
        self.layer1 = self._make_layer(64, layers[0], 1, False)
        self.layer2 = self._make_layer(128, layers[1], 2, rswd[0])
        self.layer3 = self._make_layer(256, layers[2], 2, rswd[1])
        self.layer4 = self._make_layer(512, layers[3], 2, rswd[2])

    def _make_layer(self, planes, blocks, stride, dilate):
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride,
                             previous_dilation, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes, 1, self.dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


class Backbone(nn.Module):
    """encoder_decoder.py:14-59 incl. the layer4 ``_nostride_dilate``
    post-construction surgery (dilate 2, 4, 8, ...)."""

    def __init__(self, depth=50, replace_stride_with_dilation=(False, False, False)):
        super().__init__()
        layers = {18: [2, 2, 2, 2], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[depth]
        self.backbone = DeepStemResNet(layers, replace_stride_with_dilation)
        dilate = 2
        for block in self.backbone.layer4.children():
            for m in block.modules():
                if isinstance(m, nn.Conv2d):
                    if m.stride == (2, 2):
                        m.stride = (1, 1)
                        if m.kernel_size == (3, 3):
                            m.dilation = (dilate, dilate)
                            m.padding = (dilate, dilate)
                    elif m.kernel_size == (3, 3):
                        m.dilation = (dilate, dilate)
                        m.padding = (dilate, dilate)
            dilate *= 2

    def forward(self, x):
        return self.backbone(x)


# ---------------------------------------------------------------------------
# DeepLabV3+ head (encoder_decoder.py:62-164)
class ASPP(nn.Module):
    def __init__(self, in_ch, out_ch, rates=(6, 12, 18), hidden=256):
        super().__init__()
        self.map_convs = nn.ModuleList([
            nn.Conv2d(in_ch, hidden, 1, bias=False),
            nn.Conv2d(in_ch, hidden, 3, bias=False, dilation=rates[0],
                      padding=rates[0]),
            nn.Conv2d(in_ch, hidden, 3, bias=False, dilation=rates[1],
                      padding=rates[1]),
            nn.Conv2d(in_ch, hidden, 3, bias=False, dilation=rates[2],
                      padding=rates[2]),
        ])
        self.map_bn = nn.BatchNorm2d(hidden * 4)
        self.global_pooling_conv = nn.Conv2d(in_ch, hidden, 1, bias=False)
        self.global_pooling_bn = nn.BatchNorm2d(hidden)
        self.red_conv = nn.Conv2d(hidden * 4, out_ch, 1, bias=False)
        self.pool_red_conv = nn.Conv2d(hidden, out_ch, 1, bias=False)
        self.red_bn = nn.BatchNorm2d(out_ch)
        self.leak_relu = nn.LeakyReLU()

    def forward(self, x):
        out = torch.cat([m(x) for m in self.map_convs], dim=1)
        out = self.red_conv(self.leak_relu(self.map_bn(out)))
        pool = x.mean(dim=(2, 3), keepdim=True)
        pool = self.leak_relu(self.global_pooling_bn(self.global_pooling_conv(pool)))
        pool = self.pool_red_conv(pool)
        out = out + pool  # broadcast == repeat(1,1,H,W)
        return self.leak_relu(self.red_bn(out))


class Upsampling(nn.Module):
    def __init__(self, classifier_in, num_classes, conv_in):
        super().__init__()
        self.classifier = nn.Conv2d(classifier_in, num_classes, 1, bias=True)
        self.last_conv = nn.Sequential(
            nn.Conv2d(conv_in, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
        )

    def forward(self, x):
        return self.classifier(self.last_conv(x))


class DeepLabV3Plus(nn.Module):
    def __init__(self, num_classes, aspp_in=2048, aspp_out=256):
        super().__init__()
        conv_in = 112 if aspp_out == 64 else 304
        # reference never passes hidden_channels: 256 for every variant
        # (encoder_decoder.py:82,113)
        self.aspp = ASPP(aspp_in, aspp_out)
        self.reduce = nn.Sequential(
            nn.Conv2d(aspp_out, 48, 1, bias=False),
            nn.BatchNorm2d(48), nn.ReLU(),
        )
        self.upsample = Upsampling(256, num_classes, conv_in)

    def forward_feature(self, f_list):
        f = self.aspp(f_list[-1])
        low = self.reduce(f_list[0])
        f = F.interpolate(f, size=low.shape[-2:], mode="bilinear",
                          align_corners=True)
        return torch.cat((f, low), dim=1)


# ---------------------------------------------------------------------------
# Sigmoid cross-attention (models/attn.py)
class PatchEmbed(nn.Module):
    def __init__(self, dim_in, embed_dim):
        super().__init__()
        self.proj = nn.Linear(dim_in, embed_dim)

    def forward(self, x):  # [B, C, H, W] -> [B, HW, E]
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        return self.proj(x)


class Attention(nn.Module):
    def __init__(self, dim, num_heads=4):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=False)
        self.k = nn.Linear(dim, dim, bias=False)
        self.v = nn.Linear(dim, dim, bias=False)
        self.proj = nn.Linear(dim, dim)

    def _split(self, x, f):
        B, N, C = x.shape
        return f(x).reshape(B, N, self.num_heads, C // self.num_heads
                            ).permute(0, 2, 1, 3)

    def forward(self, x_q, x_k, x_v):
        B, N, C = x_q.shape
        q, k, v = (self._split(x_q, self.q), self._split(x_k, self.k),
                   self._split(x_v, self.v))
        attn = torch.sigmoid((q @ k.transpose(-2, -1)) * self.scale)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x), attn


class Block(nn.Module):
    """attn.py:109-162 mode='CA': shared norm1, residual on normed q."""

    def __init__(self, dim, num_heads=4, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TimmMlp(dim, int(dim * mlp_ratio), dim)

    def sdp(self, q, k, v):
        out, attn = self.attn(q, k, v)
        q = q + out
        q = q + self.mlp(self.norm2(q))
        return q, attn

    def forward(self, f_v, f_a):
        f_v = self.norm1(f_v)
        f_a = self.norm1(f_a)
        f_v, attn_v = self.sdp(f_v, f_a, f_a)
        f_a, _ = self.sdp(f_a, f_v, f_v)
        return f_v, f_a, attn_v


class CROSS_ATTENTION(nn.Module):
    def __init__(self, dim_in, embed_dim, depth=1, num_heads=4,
                 num_patches_v=128 * 128):
        super().__init__()
        self.patch_embed_v = PatchEmbed(dim_in, embed_dim)
        self.patch_embed_a = PatchEmbed(dim_in, embed_dim)
        self.pos_embed_v = nn.Parameter(
            torch.zeros(1, num_patches_v, embed_dim))
        self.pos_embed_a = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.blocks = nn.Sequential(
            *[Block(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, f_v, f_a):
        f_v = self.patch_embed_v(f_v)
        f_a = self.patch_embed_a(f_a)
        for blk in self.blocks:
            f_v, f_a, attn_v = blk(f_v, f_a)
        return self.norm(f_v), f_a, attn_v


# ---------------------------------------------------------------------------
# Audio towers
class VGGAudio(nn.Module):
    """vgg.py:5-36 named as AudioModel.backbone (features/embeddings)."""

    def __init__(self, out_plane):
        super().__init__()
        layers, in_c = [], 1
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU()]
                in_c = v
        self.features = nn.Sequential(*layers)
        self.embeddings = nn.Sequential(
            nn.Linear(512 * 4 * 6, 4096), nn.ReLU(),
            nn.Linear(4096, 4096), nn.ReLU(),
            nn.Linear(4096, out_plane), nn.ReLU(),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.transpose(1, 3).transpose(1, 2).contiguous()
        return self.embeddings(x.view(x.size(0), -1))


class TVBasicBlock(nn.Module):
    """torchvision.models.resnet.BasicBlock (state_dict-name-identical)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + r)


class TVResNet18(nn.Module):
    """torchvision resnet18 skeleton (weights=None), inlined because
    torchvision isn't available in this image — module names match the
    torchvision state_dict exactly, with the reference's surgeries
    applied (audio_network.py:19-25): in_plane-channel conv1,
    AdaptiveMaxPool2d head, fc -> out_plane."""

    def __init__(self, in_plane, out_plane):
        super().__init__()
        self.conv1 = nn.Conv2d(in_plane, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 1)
        self.layer2 = self._make_layer(128, 2)
        self.layer3 = self._make_layer(256, 2)
        self.layer4 = self._make_layer(512, 2)
        self.avgpool = nn.AdaptiveMaxPool2d((1, 1))
        self.fc = nn.Linear(512, out_plane)

    def _make_layer(self, planes, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes))
        layers = [TVBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers.append(TVBasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        x = self.avgpool(x)
        return self.fc(torch.flatten(x, 1))


class AudioModel(nn.Module):
    """audio_network.py:9-34; 'vgg' or torchvision-style resnet18."""

    def __init__(self, backbone, out_plane, in_plane=1, num_classes=2):
        super().__init__()
        if backbone == "vgg":
            self.backbone = VGGAudio(out_plane)
        else:
            self.backbone = TVResNet18(in_plane, out_plane)
        self.cls_head = nn.Linear(out_plane, num_classes)

    def forward(self, x):
        return self.backbone(x)


# ---------------------------------------------------------------------------
# Assembled CAVP (cavp_model.py:69-205)
class TorchCAVP(nn.Module):
    def __init__(self, num_classes=71, visual_backbone=50,
                 last_three_dilation_stride=(False, False, False),
                 audio_backbone="vgg", in_plane=1):
        super().__init__()
        self.latent_dim = 304
        self.backbone = Backbone(visual_backbone, last_three_dilation_stride)
        # aspp_in is 2048 for every depth here: the reference's "18"
        # also ends in 2048 channels (its resnet18 builds Bottleneck
        # [2,2,2,2], resnet.py:204-205) but cavp_model.py:95 passes
        # aspp_in_plane=512 for it — a latent crash in the reference
        # (never runnable); the rebuild's working depth-18 config uses
        # 2048, which is what this replica pairs with
        self.segment = DeepLabV3Plus(num_classes, aspp_in=2048, aspp_out=256)
        self.cross_att = CROSS_ATTENTION(dim_in=304, embed_dim=304, depth=1)
        self.visual_projector = TimmMlp(304, 256, 304)
        self.audio_backbone = AudioModel(audio_backbone, 304, in_plane)

    def forward_fusion(self, fea_v, fea_a):
        B, C, H, W = fea_v.shape
        tokens = fea_v.flatten(2).transpose(1, 2)
        tokens = self.visual_projector(tokens)
        fea_v = tokens.transpose(1, 2).reshape(B, C, H, W)
        fea_a = fea_a.unsqueeze(-1).unsqueeze(-1)
        fused, _, attn_v = self.cross_att(fea_v, fea_a)
        return fused.transpose(1, 2).reshape(B, C, H, W), attn_v

    def forward_inference(self, image, audio):
        feats = self.backbone(image)
        fea_v = self.segment.forward_feature(feats)
        fea_a = self.audio_backbone(audio)
        fused, attn_v = self.forward_fusion(fea_v, fea_a)
        logits = self.segment.upsample(fused)
        logits = F.interpolate(logits, size=image.shape[-2:], mode="bilinear",
                               align_corners=False)
        return logits, fused, attn_v

    def forward_train(self, image, audio_2b):
        """cavp_model.py:175-188 (audio_func=False, the trainers' call):
        the visual feature is duplicated for the matched ‖ shuffled audio
        batch and the classifier head runs on all 2B samples."""
        feats = self.backbone(image)
        fea_v = self.segment.forward_feature(feats)
        fea_v = torch.cat((fea_v, fea_v.clone()), dim=0)
        fea_a = self.audio_backbone(audio_2b)
        fused, attn_v = self.forward_fusion(fea_v, fea_a)
        logits = self.segment.upsample(fused)
        logits = F.interpolate(logits, size=image.shape[-2:], mode="bilinear",
                               align_corners=False)
        return logits, fused, attn_v

    def forward_train_gather(self, image, audio_b, shuffle_idx):
        """cavp_model.py forward_audio path (audio_func=True — the
        vpo_stereo trainer): the tower runs on the B unshuffled clips;
        the shuffled half is the feature gather fea_a[shuffle_idx] (the
        model-level bank overwrite is dead: line 171 reassigns the
        plain gather)."""
        feats = self.backbone(image)
        fea_v = self.segment.forward_feature(feats)
        fea_v = torch.cat((fea_v, fea_v.clone()), dim=0)
        fea_a = self.audio_backbone(audio_b)
        fea_a = torch.cat((fea_a, fea_a[shuffle_idx]), dim=0)
        fused, attn_v = self.forward_fusion(fea_v, fea_a)
        logits = self.segment.upsample(fused)
        logits = F.interpolate(logits, size=image.shape[-2:], mode="bilinear",
                               align_corners=False)
        return logits, fused, attn_v


def randomize_bn_stats(model: nn.Module, seed: int = 0):
    """Give every BN nontrivial running stats + affine so eval-mode
    placement errors cannot hide behind identity statistics — and every
    LayerNorm nontrivial affine for the same reason: at torch's default
    weight=1/bias=0, a converter that swapped two same-shape LN affines
    (norm1<->norm2, wrong block) would pass logit-for-logit while
    mistranslating real trained checkpoints."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
        elif isinstance(m, nn.LayerNorm):
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
