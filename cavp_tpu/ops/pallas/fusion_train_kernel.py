"""Fused visual-fusion Pallas kernels for the TRAIN path (fwd + bwd).

The eval sibling (:mod:`fusion_kernel`) won +15.6% by running the
per-token fusion chain in one VMEM pass. The train step runs the same
chain at dup=2 (matched ‖ shuffled audio over one shared visual batch,
reference ``cavp_model.py:175-188``) and pays it twice — forward AND
backward — plus AD's activation stashes (the [2B, N, 4C] GELU input
alone is ~490 MB at b32/224-sq). This module runs:

- **forward**: the whole live train chain — visual_projector
  (fc1/gelu/fc2) -> patch_embed_v -> shared norm1 -> rank-1 sigmoid
  gate (per-dup audio factors) -> +residual -> norm2 -> Mlp ->
  +residual -> final norm — as one Pallas kernel over token blocks,
  both dup halves per block (the projector/norm1 work is shared, the
  same dedup the module path performs).
- **backward**: a second Pallas kernel that *recomputes* the chain in
  VMEM and emits every gradient — dx, per-image d(wqk)/d(m) audio-
  factor cotangents, and f32-accumulated weight/bias/LN-affine grads —
  so none of AD's intermediate tensors ever exist in HBM.

The pair is wired as a ``jax.custom_vjp``; the (tiny, per-image) audio
side — patch_embed_a, norm1 on 2B tokens, k/v projections, the
``wqk``/``m`` factor folds — stays in plain JAX where AD handles it,
receiving the kernel's factor cotangents automatically.

Exactness: same contract as the eval kernel — bf16 matmul IO with f32
accumulation, f32 LayerNorm/sigmoid/GELU math, exact (erf-form) GELU
via the Abramowitz–Stegun rational approximation (|err| <= 1.5e-7).
Gradients are the true VJP of that forward (hand-derived; pinned
against ``jax.grad`` of the module composition in
tests/test_fusion_train_kernel.py). The reference semantics being
rebuilt: ``models/attn.py:109-171`` + ``models/cavp_model.py:143-154``.

Dead-by-default outputs (``pack["visual"]``, ``attn_v``, the audio->
visual second attention) are not produced — XLA DCEs them from the
module path too; callers needing them keep the flax composition.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavp_tpu.ops.pallas.common import SQRT_2PI_INV as _SQRT_2PI_INV
from cavp_tpu.ops.pallas.common import phi_f32 as _phi

_F32 = jnp.float32


def _gelu_f32(x):
    """GELU kept in f32 (unlike the eval kernel's round-per-op _gelu):
    the recompute-backward chain reuses these f32 intermediates, and
    dgelu below must differentiate exactly this form."""
    return x * _phi(x)


def _dgelu_f32(x):
    """gelu'(x) = Phi(x) + x * pdf(x)."""
    return _phi(x) + x * _SQRT_2PI_INV * jnp.exp(-0.5 * x * x)


def _ln_fwd(x, g_ref, c_ref, eps=1e-5):
    """LayerNorm fwd in f32; returns (y_dtype, xhat_f32, r_f32)."""
    xf = x.astype(_F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * r
    y = (xhat * g_ref[0].astype(_F32) + c_ref[0].astype(_F32)).astype(x.dtype)
    return y, xhat, r


def _ln_bwd(dy, xhat, r, g_ref):
    """dx (f32) of LayerNorm given upstream dy; caller handles dg/dc."""
    dyf = dy.astype(_F32) * g_ref[0].astype(_F32)
    m1 = jnp.mean(dyf, axis=-1, keepdims=True)
    m2 = jnp.mean(dyf * xhat, axis=-1, keepdims=True)
    return r * (dyf - m1 - xhat * m2)


def _mm(x, w, out_dt=None):
    y = jnp.dot(x, w, preferred_element_type=_F32)
    return y if out_dt is None else y.astype(out_dt)


def _mm_t(dy, w):
    """dy @ w^T with f32 accumulation (contract last dims)."""
    return jax.lax.dot_general(dy, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=_F32)


def _outer(x, dy):
    """x^T @ dy accumulated in f32 (contract token dim)."""
    return jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())),
                               preferred_element_type=_F32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, wqk_ref, m_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, wpe_ref, bpe_ref,
                g1_ref, c1_ref, bp_ref, g2_ref, c2_ref,
                wm1_ref, bm1_ref, wm2_ref, bm2_ref, g3_ref, c3_ref,
                y0_ref, y1_ref, *, scale: float):
    x = x_ref[0]
    dt = x.dtype
    t1 = _gelu_f32(_mm(x, w1_ref[...]) + b1_ref[0].astype(_F32)).astype(dt)
    t2 = _mm(t1, w2_ref[...], dt) + b2_ref[0].astype(dt)
    t3 = _mm(t2, wpe_ref[...], dt) + bpe_ref[0].astype(dt)
    a, _, _ = _ln_fwd(t3, g1_ref, c1_ref)
    for d, y_ref in ((0, y0_ref), (1, y1_ref)):
        s = _mm(a, wqk_ref[0, d])                   # [T, heads] f32
        gate = jax.nn.sigmoid(s * scale).astype(dt)
        o = _mm(gate, m_ref[0, d], dt) + bp_ref[0].astype(dt)
        t4 = a + o
        b4, _, _ = _ln_fwd(t4, g2_ref, c2_ref)
        h0 = _mm(b4, wm1_ref[...]) + bm1_ref[0].astype(_F32)
        h1 = _gelu_f32(h0).astype(dt)
        t5 = t4 + (_mm(h1, wm2_ref[...], dt) + bm2_ref[0].astype(dt))
        y, _, _ = _ln_fwd(t5, g3_ref, c3_ref)
        y_ref[0] = y


# ---------------------------------------------------------------------------
# backward kernel (full recompute in VMEM)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, wqk_ref, m_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, wpe_ref, bpe_ref,
                g1_ref, c1_ref, bp_ref, g2_ref, c2_ref,
                wm1_ref, bm1_ref, wm2_ref, bm2_ref, g3_ref, c3_ref,
                dy0_ref, dy1_ref,
                # outputs
                dx_ref, dwqk_ref, dm_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, dwpe_ref, dbpe_ref,
                dg1_ref, dc1_ref, dbp_ref, dg2_ref, dc2_ref,
                dwm1_ref, dbm1_ref, dwm2_ref, dbm2_ref, dg3_ref, dc3_ref,
                *, scale: float):
    first_tok = pl.program_id(1) == 0
    first_all = jnp.logical_and(pl.program_id(0) == 0, first_tok)

    @pl.when(first_all)
    def _zero_weight_accs():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref, dwpe_ref, dbpe_ref,
                    dg1_ref, dc1_ref, dbp_ref, dg2_ref, dc2_ref,
                    dwm1_ref, dbm1_ref, dwm2_ref, dbm2_ref, dg3_ref, dc3_ref):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(first_tok)
    def _zero_image_accs():
        dwqk_ref[...] = jnp.zeros_like(dwqk_ref)
        dm_ref[...] = jnp.zeros_like(dm_ref)

    x = x_ref[0]
    dt = x.dtype

    # ---- recompute the shared prefix -----------------------------------
    t0 = _mm(x, w1_ref[...]) + b1_ref[0].astype(_F32)       # f32 [T, hid]
    t1 = _gelu_f32(t0).astype(dt)
    t2 = _mm(t1, w2_ref[...], dt) + b2_ref[0].astype(dt)
    t3 = _mm(t2, wpe_ref[...], dt) + bpe_ref[0].astype(dt)
    a, ahat, r1 = _ln_fwd(t3, g1_ref, c1_ref)

    da = jnp.zeros(a.shape, _F32)
    for d, dy_ref in ((0, dy0_ref), (1, dy1_ref)):
        # ---- recompute this dup half ------------------------------------
        s = _mm(a, wqk_ref[0, d])
        gate_f = jax.nn.sigmoid(s * scale)
        gate = gate_f.astype(dt)
        o = _mm(gate, m_ref[0, d], dt) + bp_ref[0].astype(dt)
        t4 = a + o
        b4, b4hat, r2 = _ln_fwd(t4, g2_ref, c2_ref)
        h0 = _mm(b4, wm1_ref[...]) + bm1_ref[0].astype(_F32)
        h1 = _gelu_f32(h0).astype(dt)
        fc2o = _mm(h1, wm2_ref[...], dt) + bm2_ref[0].astype(dt)
        t5 = t4 + fc2o
        _, t5hat, r3 = _ln_fwd(t5, g3_ref, c3_ref)

        # ---- backward through this half ---------------------------------
        dy = dy_ref[0]
        dyf = dy.astype(_F32)
        dg3_ref[...] += jnp.sum(dyf * t5hat, axis=0, keepdims=True)
        dc3_ref[...] += jnp.sum(dyf, axis=0, keepdims=True)
        dt5 = _ln_bwd(dy, t5hat, r3, g3_ref)                 # f32 [T, C]
        dt5d = dt5.astype(dt)
        # t5 = t4 + h1@Wm2 + bm2
        dh1 = _mm_t(dt5d, wm2_ref[...])                      # f32 [T, mh]
        dwm2_ref[...] += _outer(h1, dt5d)
        dbm2_ref[...] += jnp.sum(dt5, axis=0, keepdims=True)
        dh0 = dh1 * _dgelu_f32(h0)
        dh0d = dh0.astype(dt)
        db4 = _mm_t(dh0d, wm1_ref[...])                      # f32 [T, C]
        dwm1_ref[...] += _outer(b4, dh0d)
        dbm1_ref[...] += jnp.sum(dh0, axis=0, keepdims=True)
        dg2_ref[...] += jnp.sum(db4 * b4hat, axis=0, keepdims=True)
        dc2_ref[...] += jnp.sum(db4, axis=0, keepdims=True)
        dt4 = dt5 + _ln_bwd(db4.astype(dt), b4hat, r2, g2_ref)
        dt4d = dt4.astype(dt)
        # t4 = a + gate @ m + bp
        dgate = _mm_t(dt4d, m_ref[0, d])                     # f32 [T, heads]
        dm_ref[0, d] += _outer(gate, dt4d)
        dbp_ref[...] += jnp.sum(dt4, axis=0, keepdims=True)
        ds = (dgate * gate_f * (1.0 - gate_f) * scale).astype(dt)
        dwqk_ref[0, d] += _outer(a, ds)
        da += dt4 + _mm_t(ds, wqk_ref[0, d])

    # ---- shared prefix backward -----------------------------------------
    dad = da.astype(dt)
    dg1_ref[...] += jnp.sum(da * ahat, axis=0, keepdims=True)
    dc1_ref[...] += jnp.sum(da, axis=0, keepdims=True)
    dt3 = _ln_bwd(dad, ahat, r1, g1_ref)
    dt3d = dt3.astype(dt)
    dt2 = _mm_t(dt3d, wpe_ref[...])
    dwpe_ref[...] += _outer(t2, dt3d)
    dbpe_ref[...] += jnp.sum(dt3, axis=0, keepdims=True)
    dt2d = dt2.astype(dt)
    dt1 = _mm_t(dt2d, w2_ref[...])
    dw2_ref[...] += _outer(t1, dt2d)
    db2_ref[...] += jnp.sum(dt2, axis=0, keepdims=True)
    dt0 = dt1 * _dgelu_f32(t0)
    dt0d = dt0.astype(dt)
    dx_ref[0] = _mm_t(dt0d, w1_ref[...]).astype(dt)
    dw1_ref[...] += _outer(x, dt0d)
    db1_ref[...] += jnp.sum(dt0, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# host wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pick_block(n: int, dtype, cap: int = 512) -> int:
    """Largest sublane-aligned divisor of n <= cap; if none exists the
    token axis is padded (zero-cotangent pad rows contribute nothing to
    any gradient accumulator, so padding is grad-exact too).

    cap=512 -> block 448 at N=3136: the round-5 chip sweep
    (scripts/bench_train_block.py) measured 448 > 224 (+0.9-1.0% b128,
    +0.6% b32) and 784 negative (-1.1%); losses identical per block."""
    req = 16 if dtype == jnp.bfloat16 else 8
    best = 0
    for t in range(req, min(n, cap) + 1, req):
        if n % t == 0:
            best = t
    if best == 0:
        best = min(cap, ((n + req - 1) // req) * req)
    return best


def _pad_tokens(x, t):
    n = x.shape[1]
    n_pad = ((n + t - 1) // t) * t
    if n_pad == n:
        return x, n
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))), n


_WNAMES = ("w1", "b1", "w2", "b2", "wpe", "bpe", "g1", "c1", "bp",
           "g2", "c2", "wm1", "bm1", "wm2", "bm2", "g3", "c3")


def _weight_specs(ws):
    bcast2 = lambda b, t: (0, 0)
    return [pl.BlockSpec(w.shape, bcast2, memory_space=pltpu.VMEM)
            for w in ws]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _token_chain(num_heads, interpret, x, wqk2, m2, *ws):
    y0, y1 = _token_chain_fwd(num_heads, interpret, x, wqk2, m2, *ws)[0]
    return y0, y1


def _token_chain_fwd(num_heads, interpret, x, wqk2, m2, *ws):
    interpret = interpret or jax.default_backend() == "cpu"
    B, N, C = x.shape
    dt = x.dtype
    hd = C // num_heads
    scale = hd ** -0.5
    t = _pick_block(N, dt)
    xp, n_true = _pad_tokens(x, t)
    n_pad = xp.shape[1]
    tok = lambda b, i: (b, i, 0)
    per_b = lambda b, i: (b, 0, 0, 0)

    y0, y1 = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(B, n_pad // t),
        in_specs=[
            pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C, num_heads), per_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, num_heads, C), per_b,
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(ws),
        out_specs=[pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, n_pad, C), dt)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(xp, wqk2, m2, *ws)
    y0, y1 = y0[:, :n_true], y1[:, :n_true]
    return (y0, y1), (x, wqk2, m2) + tuple(ws)


def _token_chain_bwd(num_heads, interpret, res, cts):
    x, wqk2, m2 = res[:3]
    ws = res[3:]
    dy0, dy1 = cts
    interpret = interpret or jax.default_backend() == "cpu"
    B, N, C = x.shape
    dt = x.dtype
    hd = C // num_heads
    scale = hd ** -0.5
    t = _pick_block(N, dt)
    xp, n_true = _pad_tokens(x, t)
    dy0p, _ = _pad_tokens(dy0.astype(dt), t)
    dy1p, _ = _pad_tokens(dy1.astype(dt), t)
    n_pad = xp.shape[1]
    tok = lambda b, i: (b, i, 0)
    per_b = lambda b, i: (b, 0, 0, 0)
    acc = lambda b, i: (0, 0)

    out_shapes = (
        [jax.ShapeDtypeStruct((B, n_pad, C), dt),               # dx
         jax.ShapeDtypeStruct((B, 2, C, num_heads), _F32),      # dwqk
         jax.ShapeDtypeStruct((B, 2, num_heads, C), _F32)]      # dm
        + [jax.ShapeDtypeStruct(w.shape, _F32) for w in ws])
    out_specs = (
        [pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 2, C, num_heads), per_b, memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 2, num_heads, C), per_b, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, acc, memory_space=pltpu.VMEM) for w in ws])

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(B, n_pad // t),
        in_specs=[
            pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C, num_heads), per_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, num_heads, C), per_b,
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(ws) + [
            pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, C), tok, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xp, wqk2, m2, *ws, dy0p, dy1p)

    dx = outs[0][:, :n_true]
    dwqk = outs[1].astype(wqk2.dtype)
    dm = outs[2].astype(m2.dtype)
    dws = tuple(g.astype(w.dtype) for g, w in zip(outs[3:], ws))
    return (dx, dwqk, dm) + dws


_token_chain.defvjp(_token_chain_fwd, _token_chain_bwd)


def fusion_train(params: Dict[str, Any], fea_v, fea_a, *,
                 num_heads: int = 4, interpret: bool = False):
    """Train-path fusion: fea_v [B,h,w,C] visual feature (grad), fea_a
    [2B,C] audio features matched ‖ shuffled (grad). Returns fused
    tokens [2B, h*w, C] == the module path's ``forward_fusion(...,
    dup=2)[0]`` reshaped, up to bf16 rounding. Differentiable via the
    hand-written Pallas VJP."""
    proj = params["visual_projector"]
    ca = params["cross_att"]
    blk = ca["block0"]
    att = blk["attn"]

    B, hh, ww, C = fea_v.shape
    N = hh * ww
    dt = fea_v.dtype
    heads = num_heads
    hd = C // heads
    assert fea_a.shape == (2 * B, C), (fea_a.shape, B, C)

    # ---- audio side (tiny; plain JAX, AD-differentiable) ----------------
    fa = fea_a.reshape(2 * B, 1, C).astype(dt)
    fa = fa @ ca["patch_embed_a"]["proj"]["kernel"].astype(dt) \
        + ca["patch_embed_a"]["proj"]["bias"].astype(dt)
    g1 = blk["norm1"]["scale"]
    c1 = blk["norm1"]["bias"]
    faf = fa.astype(_F32)
    mu = jnp.mean(faf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(faf - mu), axis=-1, keepdims=True)
    fan = (((faf - mu) * jax.lax.rsqrt(var + 1e-5)) * g1 + c1).astype(dt)
    kk = (fan @ att["k"]["kernel"].astype(dt)).reshape(2 * B, heads, hd)
    vv = (fan @ att["v"]["kernel"].astype(dt)).reshape(2 * B, heads, hd)
    wq = att["q"]["kernel"].astype(dt)
    wp = att["proj"]["kernel"].astype(dt)
    wqk = jnp.einsum("chd,bhd->bch", wq.reshape(C, heads, hd), kk)
    m = jnp.einsum("bhd,hdc->bhc", vv, wp.reshape(heads, hd, C))
    # regroup [2B, ...] (matched ‖ shuffled) into per-image dup pairs
    wqk2 = wqk.reshape(2, B, C, heads).transpose(1, 0, 2, 3)
    m2 = m.reshape(2, B, heads, C).transpose(1, 0, 2, 3)

    row = lambda a: a.astype(dt).reshape(1, -1)
    ws = (
        proj["fc1"]["kernel"].astype(dt), row(proj["fc1"]["bias"]),
        proj["fc2"]["kernel"].astype(dt), row(proj["fc2"]["bias"]),
        ca["patch_embed_v"]["proj"]["kernel"].astype(dt),
        row(ca["patch_embed_v"]["proj"]["bias"]),
        row(g1), row(c1),
        row(att["proj"]["bias"]),
        row(blk["norm2"]["scale"]), row(blk["norm2"]["bias"]),
        blk["mlp"]["fc1"]["kernel"].astype(dt), row(blk["mlp"]["fc1"]["bias"]),
        blk["mlp"]["fc2"]["kernel"].astype(dt), row(blk["mlp"]["fc2"]["bias"]),
        row(ca["norm"]["scale"]), row(ca["norm"]["bias"]),
    )

    x = fea_v.reshape(B, N, C)
    y0, y1 = _token_chain(num_heads, interpret, x, wqk2, m2, *ws)
    return jnp.concatenate([y0, y1], axis=0)
