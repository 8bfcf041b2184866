"""Fused visual-fusion Pallas kernel (eval path).

The CAVP fusion stage (``models/cavp_model.py:143-154`` +
``models/attn.py:109-171`` in the reference; rebuilt in
``cavp_tpu/models/{cavp,attn}.py``) is, at inference, a pure per-token
chain over the ~B*N visual tokens:

    projector.fc1 -> gelu -> projector.fc2 -> patch_embed_v -> norm1
    -> rank-1 sigmoid gate (collapsed q/out projections) -> +residual
    -> norm2 -> mlp.fc1 -> gelu -> mlp.fc2 -> +residual -> final norm

Driven through flax/XLA this costs ~7 HBM round-trips over the token
tensor (each matmul materializes its output). All the weights together
are ~1.8 MB bf16, so the whole chain fits VMEM: this kernel reads each
token block once, runs the full chain on-chip, and writes the result
once — the HBM traffic drops from ~7x to ~2x the token bytes.

Exactness: the only algebraic deviations from the module path are the
same reassociations the module path itself already performs
(`Attention.collapse_rank1`) plus the fc2 @ patch_embed fold (done in
f32); everything else mirrors the module ops (f32 LayerNorm math, exact
GELU, f32 matmul accumulation with IO in the model dtype).

Eval-only by design: the train path needs the projector output
(CoroCL's ``pack["visual"]``) and batch-stat mutation, and keeps the
flax composition. No custom VJP is defined — callers must not
differentiate through this op.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavp_tpu.ops.pallas.common import erf_f32 as _erf

_F32 = jnp.float32


def _ln(x, scale_ref, bias_ref, eps=1e-5):
    """LayerNorm matching cavp_tpu.models.layers.LayerNorm (f32 math)."""
    xf = x.astype(_F32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps)
    return (y * scale_ref[0].astype(_F32) + bias_ref[0].astype(_F32)).astype(
        x.dtype)


def _mm(x, w_ref):
    """Matmul with f32 accumulation, rounded back to the IO dtype (the
    same contract XLA gives the module path's bf16 matmuls)."""
    return jnp.dot(x, w_ref[:], preferred_element_type=_F32).astype(x.dtype)


def _gelu(x):
    """Exact (erf-form) GELU in f32 — matches jax.nn.gelu
    (approximate=False) to ~1e-7; the erfc lowering jax.nn.gelu uses for
    half precision has no Mosaic primitive. NOTE this (eval) kernel
    rounds back to the IO dtype here; the train kernel's _gelu_f32
    deliberately stays f32 across its recompute chain (see
    ops/pallas/common.py)."""
    xf = x.astype(_F32)
    y = 0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))
    return y.astype(x.dtype)


def _fusion_kernel(x_ref, wqk_ref, m_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref,
                   bp_ref,
                   wm1_ref, bm1_ref, wm2_ref, bm2_ref,
                   n1s_ref, n1b_ref, n2s_ref, n2b_ref, n3s_ref, n3b_ref,
                   out_ref, *, scale: float):
    x = x_ref[0]                               # [T, C]
    dt = x.dtype
    # visual_projector fc1 -> gelu -> (fc2 @ patch_embed_v folded)
    h1 = _mm(x, w1_ref) + b1_ref[0].astype(dt)
    h1 = _gelu(h1)
    p = _mm(h1, w2_ref) + b2_ref[0].astype(dt)
    # shared norm1, rank-1 sigmoid gate, out projection (collapsed)
    a = _ln(p, n1s_ref, n1b_ref)
    s = jnp.dot(a, wqk_ref[0], preferred_element_type=_F32)   # [T, heads]
    g = jax.nn.sigmoid(s * scale).astype(dt)
    o = jnp.dot(g, m_ref[0], preferred_element_type=_F32).astype(dt)
    t4 = a + (o + bp_ref[0].astype(dt))
    # norm2 -> Mlp -> residual
    b4 = _ln(t4, n2s_ref, n2b_ref)
    h2 = _mm(b4, wm1_ref) + bm1_ref[0].astype(dt)
    h2 = _gelu(h2)
    t5 = t4 + (_mm(h2, wm2_ref) + bm2_ref[0].astype(dt))
    # final CrossAttention norm
    out_ref[0] = _ln(t5, n3s_ref, n3b_ref)


def _pick_block(n: int, dtype) -> int:
    """Largest divisor of n that is <= 1024 and sublane-aligned."""
    req = 16 if dtype == jnp.bfloat16 else 8
    best = 0
    for t in range(req, min(n, 1024) + 1, req):
        if n % t == 0:
            best = t
    return best


def layernorm_host(x, scale, bias, eps=1e-5):
    """Module-parity LayerNorm for the (tiny) audio-side prep."""
    xf = x.astype(_F32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps)
    return (y * scale.astype(_F32) + bias.astype(_F32)).astype(x.dtype)


def fused_visual_fusion(params: Dict[str, Any], fea_v, fea_a, *,
                        num_heads: int = 4,
                        block_tokens: Optional[int] = None,
                        interpret: bool = False):
    """Run the full eval fusion stage (projector -> patch embeds ->
    depth-1 sigmoid CA block -> final norm) as one Pallas kernel.

    params: the model's ``variables["params"]`` tree (needs
    ``visual_projector`` and ``cross_att``). fea_v: [B, h, w, C] visual
    feature; fea_a: [B, C] audio feature. Returns fused visual tokens
    [B, h*w, C] — identical (up to f32/bf16 rounding) to
    ``CAVP.forward_fusion(...)[0]`` at dup=1.
    """
    proj = params["visual_projector"]
    ca = params["cross_att"]
    blk = ca["block0"]
    att = blk["attn"]
    # no Mosaic on CPU — fall back to the interpreter (tests, dryruns)
    interpret = interpret or jax.default_backend() == "cpu"

    B, hh, ww, C = fea_v.shape
    N = hh * ww
    x = fea_v.reshape(B, N, C)
    dt = x.dtype
    heads = num_heads
    hd = C // heads
    scale = hd ** -0.5

    # --- folds (f32) -----------------------------------------------------
    w2 = proj["fc2"]["kernel"].astype(_F32)
    b2 = proj["fc2"]["bias"].astype(_F32)
    wpe = ca["patch_embed_v"]["proj"]["kernel"].astype(_F32)
    bpe = ca["patch_embed_v"]["proj"]["bias"].astype(_F32)
    w2f = (w2 @ wpe).astype(dt)
    b2f = (b2 @ wpe + bpe).astype(dt).reshape(1, -1)

    # --- audio side (1 token per image; plain jnp, mirrors the modules) --
    fa = fea_a.reshape(B, 1, C).astype(dt)
    fa = fa @ ca["patch_embed_a"]["proj"]["kernel"].astype(dt) \
        + ca["patch_embed_a"]["proj"]["bias"].astype(dt)
    fan = layernorm_host(fa, blk["norm1"]["scale"], blk["norm1"]["bias"])
    kk = (fan @ att["k"]["kernel"].astype(dt)).reshape(B, heads, hd)
    vv = (fan @ att["v"]["kernel"].astype(dt)).reshape(B, heads, hd)
    wq = att["q"]["kernel"].astype(dt)
    wp = att["proj"]["kernel"].astype(dt)
    wqk = jnp.einsum("chd,bhd->bch", wq.reshape(C, heads, hd), kk)
    m = jnp.einsum("bhd,hdc->bhc", vv, wp.reshape(heads, hd, C))

    # --- token-chain weights --------------------------------------------
    row = lambda a: a.astype(dt).reshape(1, -1)
    w1 = proj["fc1"]["kernel"].astype(dt)
    b1 = row(proj["fc1"]["bias"])
    bp = row(att["proj"]["bias"])
    wm1 = blk["mlp"]["fc1"]["kernel"].astype(dt)
    bm1 = row(blk["mlp"]["fc1"]["bias"])
    wm2 = blk["mlp"]["fc2"]["kernel"].astype(dt)
    bm2 = row(blk["mlp"]["fc2"]["bias"])
    n1s, n1b = row(blk["norm1"]["scale"]), row(blk["norm1"]["bias"])
    n2s, n2b = row(blk["norm2"]["scale"]), row(blk["norm2"]["bias"])
    n3s, n3b = row(ca["norm"]["scale"]), row(ca["norm"]["bias"])

    t = block_tokens or _pick_block(N, dt)
    n_pad = N
    if t == 0:  # no aligned divisor — pad the token axis
        req = 16 if dt == jnp.bfloat16 else 8
        t = min(1024, ((N + req - 1) // req) * req)
        n_pad = ((N + t - 1) // t) * t
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
    assert n_pad % t == 0

    hidden = proj["fc1"]["kernel"].shape[1]
    mlp_hidden = blk["mlp"]["fc1"]["kernel"].shape[1]
    bcast = lambda _b, _t: (0, 0)                     # shared weights
    per_b = lambda b_, t_: (b_, 0, 0)                 # per-image operands
    tok = lambda b_, t_: (b_, t_, 0)

    out = pl.pallas_call(
        functools.partial(_fusion_kernel, scale=scale),
        grid=(B, n_pad // t),
        in_specs=[
            pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, heads), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, C), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, mlp_hidden), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_hidden), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((mlp_hidden, C), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), bcast, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, C), bcast, memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), dt),
        interpret=interpret,
    )(x, wqk, m, w1, b1, w2f, b2f, bp, wm1, bm1, wm2, bm2,
      n1s, n1b, n2s, n2b, n3s, n3b)
    return out[:, :N, :]
