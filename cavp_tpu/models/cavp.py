"""CAVP model assembly, flax/NHWC.

Rebuilds ``models/cavp_model.py:69-205``:

- visual backbone (deep-stem ResNet-50/101/18 + DeepLabV3+, or
  HRNet/OCR/PVT variants) producing the 1/4-resolution fusion feature;
- ``visual_projector`` Mlp(latent, 256, latent) over tokens
  (cavp_model.py:123-128, 143-148);
- sigmoid cross-attention fusion (CROSS_ATTENTION depth=1);
- classifier head + bilinear (align_corners=False) upsample to the
  input resolution (cavp_model.py:138-141).

Training-path notes (cavp_model.py:175-188): the visual feature is
duplicated (matched ‖ shuffled batch) and the audio tower runs on the
2B-clip batch. The reference's model-level SoundBank overwrite at
``forward_audio`` is dead code — line 171 unconditionally reassigns
``shuffle_fea_a = fea_a[shuffle_idx]`` after the overwrite — so the
operative shuffle is a pure gather; the *waveform-level* SoundBank in the
trainer is the live one and is rebuilt in
:mod:`cavp_tpu.models.soundbank`. Here, the caller passes the already
shuffled/overwritten audio batch, matching observable reference
behavior.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.attn import CrossAttention
from cavp_tpu.models.audio_nets import AudioModel
from cavp_tpu.models.deeplabv3p import DeepLabV3Plus
from cavp_tpu.models.layers import Mlp
from cavp_tpu.models.resnet import ResNet
from cavp_tpu.ops.interp import interpolate_bilinear

LATENT_DIM = {"DeepLabV3Plus": 304, "HRNet": 720, "OCR": 512, "PVT": 112}


class ProjectionHead(nn.Module):
    """cavp_model.py:55-66 — conv1x1+BN+conv1x1 projection. Defined by
    the reference but unused by CAVP (the operative projector is the
    Mlp); kept for API parity."""

    proj_dim: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from cavp_tpu.models.layers import BatchNorm, Conv

        dim_in = x.shape[-1]
        x = Conv(dim_in, 1, use_bias=True, dtype=self.dtype, name="proj0")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      name="proj_bn")(x, not train)
        return Conv(self.proj_dim, 1, use_bias=True, dtype=self.dtype,
                    name="proj1")(x)


class CAVP(nn.Module):
    """The full audio-visual segmentation system."""

    num_classes: int = 71
    seg_model: str = "DeepLabV3Plus"
    visual_backbone: int = 50
    last_three_dilation_stride: Sequence[bool] = (False, False, False)
    audio_backbone: str = "vgg"
    in_plane: int = 1
    pvt_variant: str = "b5"  # CAVP uses pvt_v2_b5 (cavp_model.py:108)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # Train-path head economy: the reference runs the classifier head +
    # full-res upsample on the duplicated [2B] batch but the trainer
    # zeroes the shuffled half's *loss* contribution
    # (trainer_cavp_avss_image.py:204 ``output_cat[:B] +
    # output_cat[B:] * 0.0``), so computing the head on the matched half
    # only saves ~16% of train FLOPs (+13% img/s at batch 64). It is NOT
    # bit-identical: the head's train-mode BatchNorm statistics are then
    # computed over B matched samples instead of the 2B matched‖shuffled
    # mix, which changes the matched half's normalization (and hence
    # values/gradients) slightly — a deliberate, documented
    # training-dynamics deviation (arguably cleaner: head BN stats stop
    # being polluted by the synthetic mismatch distribution). The eval
    # path is unaffected either way. False restores exact reference
    # behavior.
    cls_matched_only: bool = True
    # Exact decomposed-MLP dedup in the fusion block's dup=2 train path
    # (the big fc1 contraction runs on B, not 2B — see
    # models/attn.py Block._mlp_dedup_update). Pure reassociation;
    # measured -4.2% in-context (docs/performance.md) -> opt-in.
    fusion_mlp_dedup: bool = False

    @property
    def latent_dim(self) -> int:
        # cavp_model.py:86,107 sets 304 for DeepLabV3Plus / 112 for PVT.
        # The reference pins 304 even for the resnet18 backbone, whose
        # DeepLab feature is 112-ch (aspp_out 64 + 48) — that combination
        # crashes upstream; here latent tracks the real feature width so
        # every backbone choice is runnable.
        if self.seg_model == "DeepLabV3Plus" and self.visual_backbone not in (50, 101):
            return 112
        return LATENT_DIM[self.seg_model]

    def setup(self):
        if self.seg_model == "DeepLabV3Plus":
            self.backbone = ResNet(
                depth=self.visual_backbone,
                replace_stride_with_dilation=tuple(self.last_three_dilation_stride),
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
            self.segment = DeepLabV3Plus(
                num_classes=self.num_classes,
                aspp_out_plane=256 if self.visual_backbone in (50, 101) else 64,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
        elif self.seg_model == "HRNet":
            from cavp_tpu.models.hrnet import HRNetW48Backbone, HRNetW48Head
            self.backbone = HRNetW48Backbone(axis_name=self.axis_name,
                                             dtype=self.dtype)
            self.segment = HRNetW48Head(num_classes=self.num_classes,
                                        axis_name=self.axis_name, dtype=self.dtype)
        elif self.seg_model == "OCR":
            from cavp_tpu.models.hrnet import HRNetW48Backbone
            from cavp_tpu.models.ocr import OCRHead
            self.backbone = HRNetW48Backbone(axis_name=self.axis_name,
                                             dtype=self.dtype)
            self.segment = OCRHead(num_classes=self.num_classes,
                                   axis_name=self.axis_name, dtype=self.dtype)
        elif self.seg_model == "PVT":
            from cavp_tpu.models.pvt import PVTv2
            self.backbone = PVTv2(variant=self.pvt_variant, dtype=self.dtype)
            self.segment = DeepLabV3Plus(num_classes=self.num_classes,
                                         aspp_out_plane=64,
                                         axis_name=self.axis_name,
                                         dtype=self.dtype)
        else:
            raise ValueError(f"UNKNOWN SEG MODEL {self.seg_model}")

        self.cross_att = CrossAttention(embed_dim=self.latent_dim,
                                        depth=1, num_heads=4,
                                        mlp_dedup=self.fusion_mlp_dedup,
                                        dtype=self.dtype)
        self.visual_projector = Mlp(hidden_features=256,
                                    out_features=self.latent_dim,
                                    dtype=self.dtype)
        self.audio_net = AudioModel(backbone=self.audio_backbone,
                                    out_plane=self.latent_dim,
                                    in_plane=self.in_plane,
                                    axis_name=self.axis_name,
                                    dtype=self.dtype)

    # ------------------------------------------------------------------
    def forward_visual_feature(self, image, train: bool):
        """Backbone + seg head feature: [B,H,W,3] -> [B,h,w,latent]."""
        feats = self.backbone(image, train)
        return self.segment.forward_feature(feats, train)

    def forward_fusion(self, fea_v, fea_a, dup: int = 1):
        """cavp_model.py:143-154. fea_v [B,h,w,C]; fea_a [dup*B,C].

        ``dup=2`` is the train path: the reference duplicates the visual
        feature (``cat((fea_v, fea_v))``, cavp_model.py:181) for the
        matched ‖ shuffled audio batch. Both halves of the projector /
        patch-embed / norm1 / Q-projection outputs are then identical
        row-for-row, so they run once on B and the attended (audio-
        dependent) tensors carry dup*B — exact, measured ~6% off the
        train step."""
        B, h, w, C = fea_v.shape
        tokens = fea_v.reshape(B, h * w, C)
        tokens = self.visual_projector(tokens)
        fea_v_proj = tokens.reshape(B, h, w, C)
        fused, f_a, attn_v = self.cross_att(
            fea_v_proj, fea_a.reshape(dup * B, 1, 1, C), dup=dup)
        fused = fused.reshape(dup * B, h, w, C)
        if dup > 1:  # pack shape parity with the reference's 2B visual
            fea_v_proj = jnp.tile(fea_v_proj, (dup, 1, 1, 1))
        return fused, {"audio": fea_a, "visual": fea_v_proj, "attn_v": attn_v}

    def forward_cls(self, fused, out_hw: Tuple[int, int], train: bool):
        """cavp_model.py:138-141: head + align_corners=False upsample."""
        logits = self.segment.upsample(fused, train)
        return interpolate_bilinear(logits, out_hw, align_corners=False)

    def forward_audio_feature(self, audio, train: bool):
        return self.audio_net(audio, train)

    # ------------------------------------------------------------------
    def forward_inference(self, image, audio):
        """Eval path (cavp_model.py:190-197). image [B,H,W,3] NHWC,
        audio [B,T,64,Cin] NHWC. Returns (logits, fused, pack)."""
        fea_v = self.forward_visual_feature(image, train=False)
        fea_a = self.audio_net(audio, train=False)
        fused, pack = self.forward_fusion(fea_v, fea_a)
        logits = self.forward_cls(fused, image.shape[1:3], train=False)
        return logits, fused, pack

    def forward_train(self, image, audio, audio_gather_idx=None):
        """Train path (cavp_model.py:175-188): the visual feature pairs
        with the matched ‖ shuffled audio batch (the reference
        duplicates it; here the duplicate halves of the visual-side
        projections are computed once — see forward_fusion dup).

        Two audio conventions, matching the reference's two trainer
        modes:

        - ``audio_gather_idx=None`` (avss/vpo_mono/avs_obj,
          ``audio_func=False``): ``audio`` is the concatenated [2B,...]
          spectrogram batch (matched ‖ shuffled-or-bank-overwritten
          waveforms) and the tower runs on all 2B clips.
        - ``audio_gather_idx=[B]`` (vpo_stereo, ``audio_func=True`` —
          cavp_model.py:156-173): ``audio`` is the [B,...] *unshuffled*
          batch; the tower runs once and the shuffled half is the
          feature gather ``fea_a[idx]`` (the reference's model-level
          bank overwrite is dead code: line 171 unconditionally
          reassigns the plain gather). This also keeps the audio
          tower's train-mode BN batch size at B, as the reference
          computes it. The avss audio-dedup path (engine/loops.py)
          reuses this hook with ``audio`` of shape [B+K] (matched B ‖
          K bank-overwrite slots) and indices into that batch — the
          matched half is always rows [:B].
        """
        B = image.shape[0]
        fea_v = self.forward_visual_feature(image, train=True)
        fea_a = self.audio_net(audio, train=True)
        if audio_gather_idx is not None:
            fea_a = jnp.concatenate([fea_a[:B], fea_a[audio_gather_idx]],
                                    axis=0)
        fused, pack = self.forward_fusion(fea_v, fea_a, dup=2)
        head_in = fused[:B] if self.cls_matched_only else fused
        logits = self.forward_cls(head_in, image.shape[1:3], train=True)
        return logits, fused, pack

    def __call__(self, image, audio, eval_mode: bool = True,
                 audio_gather_idx=None):
        if eval_mode:
            return self.forward_inference(image, audio)
        return self.forward_train(image, audio, audio_gather_idx)


class VisualModel(nn.Module):
    """Baseline without audio/cross-attention
    (``models/visual/visual_network.py:17-61``, ``--use_baseline``)."""

    num_classes: int
    visual_backbone: int = 50
    last_three_dilation_stride: Sequence[bool] = (False, False, False)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depth=self.visual_backbone,
            replace_stride_with_dilation=tuple(self.last_three_dilation_stride),
            axis_name=self.axis_name, dtype=self.dtype)
        self.segment = DeepLabV3Plus(
            num_classes=self.num_classes,
            aspp_out_plane=256 if self.visual_backbone in (50, 101) else 64,
            axis_name=self.axis_name, dtype=self.dtype)

    def __call__(self, image, audio=None, eval_mode: bool = True):
        """Signature-compatible with CAVP (audio ignored) so the shared
        train/eval steps serve ``--use_baseline`` unchanged. Returns the
        same (logits, feature, pack) triple."""
        train = not eval_mode
        feats = self.backbone(image, train)
        fea = self.segment.forward_feature(feats, train)
        logits = self.segment.upsample(fea, train)
        logits = interpolate_bilinear(logits, image.shape[1:3],
                                      align_corners=False)
        return logits, fea, {}
