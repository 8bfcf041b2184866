"""OCR (object-contextual representations) segmentation head, flax/NHWC.

Rebuilds ``models/visual/ocrnet/ocrnet.py:19-75`` +
``ocr_module.py:26-259``: 720->512 conv, SpatialGather soft class
centers from the aux head's logits, SpatialOCR object-attention
(softmax over class proxies), and the 512->num_classes classifier. The
aux head exists in the reference but only the main logits are returned
(ocrnet.py:69-75); it is kept for checkpoint parity.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import BatchNorm, Conv
from cavp_tpu.ops.interp import interpolate_bilinear


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, self.kernel,
                 padding=self.kernel // 2, use_bias=True,
                 dtype=self.dtype, name="conv")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      name="bn")(x, not train)
        return nn.relu(x)


class SpatialGather(nn.Module):
    """ocr_module.SpatialGather_Module: class-probability-weighted means
    of pixel features -> [B, num_classes, C] object proxies."""

    @nn.compact
    def __call__(self, feats, probs_logits):
        B, H, W, C = feats.shape
        k = probs_logits.shape[-1]
        probs = probs_logits.reshape(B, H * W, k)
        probs = jax.nn.softmax(probs.astype(jnp.float32), axis=1)  # over pixels
        f = feats.reshape(B, H * W, C).astype(jnp.float32)
        context = jnp.einsum("bpk,bpc->bkc", probs, f)
        return context.astype(feats.dtype)


class ObjectAttention(nn.Module):
    """ocr_module._ObjectAttentionBlock (scale=1): pixels attend to the
    class proxies with softmax over classes."""

    key_channels: int
    in_channels: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, proxy, train: bool):
        # x: [B, H, W, C]; proxy: [B, K, C]
        B, H, W, C = x.shape
        kch = self.key_channels

        def double(name):
            def f(t):
                t = _ConvBNReLU(kch, axis_name=self.axis_name,
                                dtype=self.dtype, name=f"{name}_0")(t, train)
                t = _ConvBNReLU(kch, axis_name=self.axis_name,
                                dtype=self.dtype, name=f"{name}_1")(t, train)
                return t
            return f

        query = double("f_pixel")(x).reshape(B, H * W, kch)
        proxy_map = proxy[:, :, None, :]  # [B, K, 1, C] as NHWC
        key = double("f_object")(proxy_map).reshape(B, -1, kch)
        value = _ConvBNReLU(kch, axis_name=self.axis_name, dtype=self.dtype,
                            name="f_down")(proxy_map, train).reshape(B, -1, kch)

        sim = jnp.einsum("bpk,bqk->bpq", query, key) * (kch ** -0.5)
        sim = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        context = jnp.einsum("bpq,bqk->bpk", sim, value)
        context = context.reshape(B, H, W, kch)
        context = _ConvBNReLU(self.in_channels, axis_name=self.axis_name,
                              dtype=self.dtype, name="f_up")(context, train)
        return context


class OCRHead(nn.Module):
    """ocrnet.OCR (latent_dim=512 in CAVP, cavp_model.py:102-105)."""

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.conv3x3 = _ConvBNReLU(512, kernel=3, axis_name=self.axis_name,
                                   dtype=self.dtype)
        self.gather = SpatialGather()
        self.attention = ObjectAttention(key_channels=256, in_channels=512,
                                         axis_name=self.axis_name,
                                         dtype=self.dtype)
        self.bottleneck = _ConvBNReLU(512, kernel=1, axis_name=self.axis_name,
                                      dtype=self.dtype)
        # ocr_module.py:195-200 conv_bn_dropout ends in Dropout2d(0.05):
        # channel dropout — broadcast over the NHWC spatial dims
        self.bottleneck_drop = nn.Dropout(0.05, broadcast_dims=(1, 2))
        self.aux_conv = _ConvBNReLU(720, kernel=3, axis_name=self.axis_name,
                                    dtype=self.dtype)
        self.aux_cls = Conv(self.num_classes, 1, use_bias=True,
                            dtype=self.dtype)
        self.classifier = Conv(self.num_classes, 1, use_bias=True,
                               dtype=self.dtype)

    def _concat_branches(self, feats: List[jnp.ndarray]):
        h, w = feats[0].shape[1:3]
        ups = [feats[0]] + [
            interpolate_bilinear(f, (h, w), align_corners=True)
            for f in feats[1:]]
        return jnp.concatenate(ups, axis=-1)

    def forward_feature(self, feats, train: bool):
        x = self._concat_branches(feats)
        out_aux = self.aux_cls(self.aux_conv(x, train))
        f = self.conv3x3(x, train)
        context = self.gather(f, out_aux)
        attn = self.attention(f, context, train)
        f = self.bottleneck(jnp.concatenate([attn, f], axis=-1), train)
        f = self.bottleneck_drop(f, deterministic=not train)
        return f

    def upsample(self, x, train: bool):
        return self.classifier(x)

    def __call__(self, feats, train: bool = False):
        return self.upsample(self.forward_feature(feats, train), train)
