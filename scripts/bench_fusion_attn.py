#!/usr/bin/env python
"""Fusion-stage attention micro-ablation (round 3).

The sigmoid CA with ONE audio token is algebraically a pair of
matvec-like contractions; the generic head-split path materializes
[B,h,N,hd] (hd=76, pads to 128 lanes) through explicit transposes.
Measures the generic einsum form vs a transpose-free specialization:

  visual->audio:  attn[b,n,h] = sigmoid(sum_d q[b,n,h,d] k[b,h,d] * s)
                  out[b,n,(h,d)] = attn[b,n,h] * v[b,h,d]
  audio->visual:  attn[b,n,h] = sigmoid(sum_d q[b,h,d] k[b,n,h,d] * s)
                  out[b,(h,d)] = sum_n attn[b,n,h] v[b,n,h,d]

Same math, same reduction sizes; only layouts/permutes differ.
One JSON line per variant (full fusion fwd at eval batch 80).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

B, N, C, H = 80, 56 * 56, 304, 4
HD = C // H
SCALE = HD ** -0.5


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_fn(fn, *args, iters=30):
    # sync on a scalar reduction: D2H of the full [B,N,C] output rides
    # the ~MB/s tunnel and would swamp the measurement (learned the
    # hard way — a 152 MB pull is ~200 ms/iter amortized)
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = g(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    xq = jnp.asarray(rng.randn(B, N, C), dt)      # visual tokens
    xa = jnp.asarray(rng.randn(B, 1, C), dt)      # audio token
    Wq, Wk, Wv, Wp = (jnp.asarray(rng.randn(C, C) * 0.05, dt)
                      for _ in range(4))

    def generic(xq, xa):
        q = (xq @ Wq).reshape(B, N, H, HD).transpose(0, 2, 1, 3)
        k = (xa @ Wk).reshape(B, 1, H, HD).transpose(0, 2, 1, 3)
        v = (xa @ Wv).reshape(B, 1, H, HD).transpose(0, 2, 1, 3)
        attn = jax.nn.sigmoid(jnp.einsum("bhnd,bhmd->bhnm", q, k) * SCALE)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return out @ Wp

    def specialized(xq, xa):
        q = (xq @ Wq).reshape(B, N, H, HD)
        k = (xa @ Wk).reshape(B, H, HD)
        v = (xa @ Wv).reshape(B, H, HD)
        attn = jax.nn.sigmoid(jnp.einsum("bnhd,bhd->bnh", q, k) * SCALE)
        out = (attn[..., None] * v[:, None]).reshape(B, N, C)
        return out @ Wp

    a = np.asarray(generic(xq, xa), np.float32)
    b = np.asarray(specialized(xq, xa), np.float32)
    emit(check_max_abs_diff=float(np.abs(a - b).max()))

    emit(variant="generic_transposed", ms=round(time_fn(generic, xq, xa), 3))
    emit(variant="specialized_nk1", ms=round(time_fn(specialized, xq, xa), 3))

    # audio->visual direction (single query, N keys)
    def generic_rev(xa, xv):
        q = (xa @ Wq).reshape(B, 1, H, HD).transpose(0, 2, 1, 3)
        k = (xv @ Wk).reshape(B, N, H, HD).transpose(0, 2, 1, 3)
        v = (xv @ Wv).reshape(B, N, H, HD).transpose(0, 2, 1, 3)
        attn = jax.nn.sigmoid(jnp.einsum("bhnd,bhmd->bhnm", q, k) * SCALE)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
        return out @ Wp

    def specialized_rev(xa, xv):
        q = (xa @ Wq).reshape(B, H, HD)
        k = (xv @ Wk).reshape(B, N, H, HD)
        v = (xv @ Wv).reshape(B, N, H, HD)
        attn = jax.nn.sigmoid(jnp.einsum("bhd,bnhd->bnh", q, k) * SCALE)
        out = jnp.einsum("bnh,bnhd->bhd", attn, v).reshape(B, 1, C)
        return out @ Wp

    a = np.asarray(generic_rev(xa, xq), np.float32)
    b = np.asarray(specialized_rev(xa, xq), np.float32)
    emit(check_rev_max_abs_diff=float(np.abs(a - b).max()))
    emit(variant="generic_rev", ms=round(time_fn(generic_rev, xa, xq), 3))
    emit(variant="specialized_rev", ms=round(time_fn(specialized_rev, xa, xq), 3))


if __name__ == "__main__":
    main()
