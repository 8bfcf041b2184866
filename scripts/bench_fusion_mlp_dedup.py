#!/usr/bin/env python
"""Train-fusion MLP dedup experiment (round-4 ladder target #1).

The refreshed train ladder names fusion fwd+bwd the biggest row
(26.35 ms raw, 23.6% MFU). Round 3 deduped the *pre-attention* half
(projector/patch-embed/norm1/Q run once on B); the MLP still runs on
the duplicated 2B batch because LayerNorm(norm2) sits between the
shared base and fc1 — and LN is nonlinear.

But LN is *per-token affine*: LN(x)_t = r_t*(x_t - mu_t)*gamma + beta.
Row scaling commutes with the matmul, so with x = tile(base) + out and
out = gate @ m + b_p rank-h per image (the collapsed sigmoid attention),

  fc1(LN(x))_t = r_t * (x @ W1g)_t - r_t*mu_t*c1 + c2
  x @ W1g      = tile(base @ W1g) + gate @ (m @ W1g) + bp @ W1g

with W1g = diag(gamma) @ W1 — the big [.,3136,304]x[304,1216] matmul
runs ONCE on B instead of 2B (its backward contractions likewise
pre-sum the two halves into B-sized matmuls under AD). Exact in real
arithmetic (pure reassociation); the 122 MB x tensor is still
materialized for the residual + LN stats, so this cuts MXU work
(~150->~80 GF of the stage's 420 GF fwd), not HBM traffic — the
measurement decides if the stage was FLOP-bound enough to care.

A/B: the full fused train composition fwd+bwd (attn-collapse form) with
the plain MLP vs the decomposed MLP, interleaved, hard scalar syncs,
plus an f32 equivalence check. One JSON line per row.
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

B, N, C, HID, HEADS = 32, 56 * 56, 304, 1216, 4
EPS = 1e-5


def emit(**kw):
    print(json.dumps(kw), flush=True)


def ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + EPS) * g + b).astype(x.dtype)


def mlp_block_plain(params, base, gate, m):
    """x = tile(base)+attn_out; x + fc2(gelu(fc1(norm2 x))) — the
    current in-model composition after the rank-1 collapse."""
    W1, b1, W2, b2, g2, be2, bp = params
    dt = base.dtype
    out = jnp.einsum("bnh,bhc->bnc", gate, m) + bp.astype(dt)
    x = jnp.tile(base, (2, 1, 1)) + out
    y = ln(x, g2, be2)
    h1 = jax.nn.gelu((y @ W1.astype(dt)) + b1.astype(dt),
                     approximate=False)
    return x + (h1 @ W2.astype(dt)) + b2.astype(dt)


def mlp_block_dedup(params, base, gate, m):
    """Decomposed-fc1 exact rewrite: the 304x1216 matmul runs on B."""
    W1, b1, W2, b2, g2, be2, bp = params
    dt = base.dtype
    out = jnp.einsum("bnh,bhc->bnc", gate, m) + bp.astype(dt)
    x = jnp.tile(base, (2, 1, 1)) + out

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)                   # [2B,N,1]
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    r = jax.lax.rsqrt(var + EPS)

    W1g = (g2[:, None] * W1).astype(dt)                    # [C,HID]
    big = base @ W1g                                       # B-sized matmul
    mW = jnp.einsum("bhc,cf->bhf", m, W1g)                 # tiny
    corr = jnp.einsum("bnh,bhf->bnf", gate, mW)            # rank-h
    c0 = (bp.astype(jnp.float32) @ (g2[:, None] * W1))     # [HID]
    c1 = g2 @ W1                                           # [HID]
    c2 = be2 @ W1 + b1                                     # [HID]

    z = jnp.tile(big, (2, 1, 1)).astype(jnp.float32) \
        + corr.astype(jnp.float32) + c0
    fc1 = (r * z - (r * mu) * c1 + c2).astype(dt)
    h1 = jax.nn.gelu(fc1, approximate=False)
    return x + (h1 @ W2.astype(dt)) + b2.astype(dt)


def loss_of(block):
    def f(params, base, gate, m):
        out = block(params, base, gate, m)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
    return f


def timeit(fn, args, iters=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    params32 = (mk(C, HID), mk(HID), mk(HID, C), mk(C),
                jnp.abs(mk(C)) + 0.5, mk(C), mk(C))
    base32 = mk(B, N, C)
    gate32 = jax.nn.sigmoid(mk(2 * B, N, HEADS))
    m32 = mk(2 * B, HEADS, C)

    # --- equivalence in f32 --------------------------------------------
    a = jax.jit(mlp_block_plain)(params32, base32, gate32, m32)
    b = jax.jit(mlp_block_dedup)(params32, base32, gate32, m32)
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    emit(what="fusion_mlp_dedup_equiv_f32", max_rel=rel)
    ga = jax.jit(jax.grad(loss_of(mlp_block_plain)))(params32, base32,
                                                     gate32, m32)
    gb = jax.jit(jax.grad(loss_of(mlp_block_dedup)))(params32, base32,
                                                     gate32, m32)
    grel = max(float(jnp.max(jnp.abs(x - y))
                     / (jnp.max(jnp.abs(x)) + 1e-9))
               for x, y in zip(jax.tree_util.tree_leaves(ga),
                               jax.tree_util.tree_leaves(gb)))
    emit(what="fusion_mlp_dedup_grad_equiv_f32", max_rel=grel)

    # --- timing in bf16 (the train compute dtype) ----------------------
    tobf = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = tobf(params32)
    base, gate, m = tobf((base32, gate32, m32))

    fns = {}
    for name, block in (("plain", mlp_block_plain),
                        ("dedup", mlp_block_dedup)):
        fwd = jax.jit(loss_of(block))
        vg = jax.jit(jax.value_and_grad(loss_of(block), argnums=(0, 1, 2, 3)))
        fns[name] = (fwd, vg)

    for _round in range(3):
        for name, (fwd, vg) in fns.items():
            ms_f = timeit(lambda *a: fwd(*a), (params, base, gate, m))
            ms_fb = timeit(lambda *a: vg(*a)[0], (params, base, gate, m))
            emit(what=f"fusion_mlp_{name}", round=_round,
                 fwd_ms=round(ms_f, 3), fwd_bwd_ms=round(ms_fb, 3))


if __name__ == "__main__":
    main()
