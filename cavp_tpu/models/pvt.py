"""PVT-v2 backbone (b0..b5), flax/NHWC.

Rebuilds ``models/visual/backbones/pvt/pvt.py:218-420``
(PyramidVisionTransformerV2): overlapping patch embeds (7/4 then 3/2),
spatial-reduction attention (softmax; sr conv per stage ratio), DWConv
Mlp, per-stage LayerNorm, returning the 4 stage maps. CAVP uses
``pvt_v2_b5`` with DeepLabV3+ (aspp 512->64, latent 112 —
cavp_model.py:106-115).

Stochastic depth (drop_path 0.1) is identity here: the reference only
fine-tunes with small rates and eval parity is exact either way; noted
for training-parity caveats.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.models.layers import Conv, Dense

LN = lambda name: nn.LayerNorm(epsilon=1e-6, name=name)

PVT_CONFIGS = {
    "b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(4, 4, 4, 4)),
}
SR_RATIOS = (8, 4, 2, 1)


class SRAttention(nn.Module):
    """pvt.py:59-131 — softmax attention with spatial-reduction kv."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        q = Dense(C, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            xs = x.reshape(B, H, W, C)
            xs = Conv(C, self.sr_ratio, strides=self.sr_ratio,
                      dtype=self.dtype, name="sr")(xs)
            xs = xs.reshape(B, -1, C)
            xs = LN("norm")(xs)
        else:
            xs = x
        kv = Dense(C * 2, dtype=self.dtype, name="kv")(xs)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return Dense(C, dtype=self.dtype, name="proj")(out)


class DWConvMlp(nn.Module):
    """pvt.py Mlp with the 3x3 depthwise conv between fc1 and act."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        x = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        xs = x.reshape(B, H, W, self.hidden)
        xs = Conv(self.hidden, 3, padding=1, groups=self.hidden,
                  dtype=self.dtype, name="dwconv")(xs)
        x = xs.reshape(B, N, self.hidden)
        x = jax.nn.gelu(x, approximate=False)
        x = Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        x = x + SRAttention(dim=self.dim, num_heads=self.num_heads,
                            sr_ratio=self.sr_ratio, dtype=self.dtype,
                            name="attn")(LN("norm1")(x), H, W)
        x = x + DWConvMlp(hidden=self.dim * self.mlp_ratio, out=self.dim,
                          dtype=self.dtype, name="mlp")(LN("norm2")(x), H, W)
        return x


class PVTv2(nn.Module):
    """Returns the 4 stage maps [B, H/4, W/4, C1] ... [B, H/32, W/32, C4]."""

    variant: str = "b5"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = PVT_CONFIGS[self.variant]
        outs = []
        for i in range(4):
            patch = 7 if i == 0 else 3
            stride = 4 if i == 0 else 2
            x = Conv(cfg["embed_dims"][i], patch, strides=stride,
                     padding=patch // 2, dtype=self.dtype,
                     name=f"patch_embed{i + 1}_proj")(x)
            B, H, W, C = x.shape
            t = x.reshape(B, H * W, C)
            t = LN(f"patch_embed{i + 1}_norm")(t)
            for j in range(cfg["depths"][i]):
                t = PVTBlock(dim=C, num_heads=cfg["num_heads"][i],
                             mlp_ratio=cfg["mlp_ratios"][i],
                             sr_ratio=SR_RATIOS[i], dtype=self.dtype,
                             name=f"block{i + 1}_{j}")(t, H, W)
            t = LN(f"norm{i + 1}")(t)
            x = t.reshape(B, H, W, C)
            outs.append(x)
        return outs


class PVTv2B5(PVTv2):
    variant: str = "b5"
