#!/usr/bin/env python
"""Dilated-conv decomposition microbench (round 3, visual-tower attack).

The dilated 3x3 convs run at 14x14 spatial (avss-224, output stride 16):
layer4's conv2 at dilation 2/4/8 (512ch) and the ASPP branches at rate
6/12/18 (2048->256). At these sizes most off-center taps read zero
padding — at rate 18 the +-18 offsets are ENTIRELY out of bounds (the
branch is mathematically a 1x1 conv), at rate 12 only 2 of 14 positions
per dim overlap. `conv_general_dilated` still pays the full 9-tap FLOP
count; the exact rewrite below computes the center tap as one matmul
over all positions plus one small sliced matmul per partially-valid
off-center tap (fully-invalid taps are dropped), accumulating in f32.

Useful-FLOP fractions at H=14: d=2 1444/1764, d=4 1156/1764,
d=6 900/1764, d=8 676/1764, d=12 324/1764, d=18 196/1764.

Measures conv vs tap-decomposition, fwd (eval) and fwd+bwd (train),
amortizing the ~3.5 ms tunnel dispatch over 8 chained applications with
distinct scalings (defeats CSE). One JSON line per row.
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

REPS = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def conv_ref(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_taps(x, w, d):
    """Exact tap-matmul decomposition of a stride-1, padding=d,
    dilation-d 3x3 conv: out[p] = sum_t x[p + (t-1)d] @ w[t]."""
    B, H, W, Ci = x.shape
    f32 = jnp.float32
    out = jax.lax.dot_general(
        x, w[1, 1], (((3,), (0,)), ((), ())), preferred_element_type=f32)
    for ti in range(3):
        for tj in range(3):
            if ti == 1 and tj == 1:
                continue
            oi, oj = (ti - 1) * d, (tj - 1) * d
            p0, p1 = max(0, -oi), min(H, H - oi)
            q0, q1 = max(0, -oj), min(W, W - oj)
            if p0 >= p1 or q0 >= q1:
                continue  # tap fully out of bounds (e.g. rate 18 at 14^2)
            xs = jax.lax.slice(
                x, (0, p0 + oi, q0 + oj, 0), (B, p1 + oi, q1 + oj, Ci))
            contrib = jax.lax.dot_general(
                xs, w[ti, tj], (((3,), (0,)), ((), ())),
                preferred_element_type=f32)
            out = out + jnp.pad(
                contrib, ((0, 0), (p0, H - p1), (q0, W - q1), (0, 0)))
    return out.astype(x.dtype)


def time_fn(fn, x, w, d, grad=False, iters=20):
    if grad:
        def loss(x, w):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                acc += jnp.sum(fn(x * (1.0 + i * 1e-3), w, d).astype(jnp.float32))
            return acc
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        sync = lambda o: float(jnp.sum(o[1].astype(jnp.float32))[()])
    else:
        def run(x, w):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                acc += jnp.sum(fn(x * (1.0 + i * 1e-3), w, d).astype(jnp.float32))
            return acc
        g = jax.jit(run)
        sync = float
    out = g(x, w)
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(x, w)
    _ = sync(out)
    return (time.perf_counter() - t0) / iters / REPS * 1e3


@jax.jit
def _relmax(a, b):
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    return (jnp.max(jnp.abs(a32 - b32)) /
            jnp.maximum(jnp.max(jnp.abs(a32)), 1e-6))


def main():
    dt = jnp.bfloat16
    cases = [
        # (name, B, H, Cin, Cout, dilation)
        ("aspp_r6_b80", 80, 14, 2048, 256, 6),
        ("aspp_r12_b80", 80, 14, 2048, 256, 12),
        ("aspp_r18_b80", 80, 14, 2048, 256, 18),
        ("layer4_d2_b80", 80, 14, 512, 512, 2),
        ("layer4_d4_b80", 80, 14, 512, 512, 4),
        ("layer4_d8_b80", 80, 14, 512, 512, 8),
        ("aspp_r18_512sq_b8", 8, 32, 2048, 256, 18),
        ("aspp_r12_512sq_b8", 8, 32, 2048, 256, 12),
    ]
    for name, B, H, Ci, Co, d in cases:
        # generate on-device: H2D over the tunnel is ~0.6 MB/s, a 64 MB
        # input would cost ~2 minutes per case
        k1, k2 = jax.random.split(jax.random.PRNGKey(hash(name) % 2**31))
        x = (jax.random.normal(k1, (B, H, H, Ci), jnp.float32) * 0.5).astype(dt)
        w = (jax.random.normal(k2, (3, 3, Ci, Co), jnp.float32) * 0.02).astype(dt)
        diff = float(_relmax(conv_ref(x, w, d), conv_taps(x, w, d))[()])
        row = dict(case=name, rel_diff=round(diff, 6))
        row["conv_ms"] = round(time_fn(conv_ref, x, w, d), 4)
        row["taps_ms"] = round(time_fn(conv_taps, x, w, d), 4)
        row["speedup_fwd"] = round(row["conv_ms"] / max(row["taps_ms"], 1e-9), 3)
        emit(**row)
        # train side at b32 (grad wrt x and w)
        if B == 80:
            xg = x[:32]
            g_conv = time_fn(conv_ref, xg, w, d, grad=True)
            g_taps = time_fn(conv_taps, xg, w, d, grad=True)
            emit(case=name + "_grad_b32", conv_ms=round(g_conv, 4),
                 taps_ms=round(g_taps, 4),
                 speedup_grad=round(g_conv / max(g_taps, 1e-9), 3))

    # full ASPP branch block: merged centers (ops/dilated.aspp_branches)
    # vs four separate decomposed branches vs four plain convs
    from cavp_tpu.ops import dilated as dl

    for B, H in ((80, 14), (32, 14), (8, 32)):
        k1, k2 = jax.random.split(jax.random.PRNGKey(B * 100 + H))
        x = (jax.random.normal(k1, (B, H, H, 2048), jnp.float32) * 0.5).astype(dt)
        ws = [(jax.random.normal(jax.random.fold_in(k2, i),
                                 ((1, 1) if i == 0 else (3, 3)) + (2048, 256),
                                 jnp.float32) * 0.02).astype(dt)
              for i in range(4)]
        rates = (6, 12, 18)

        def merged(x, _w_unused, _d_unused):
            return dl.aspp_branches(x, ws[0], ws[1:], rates)

        def separate(x, _w, _d):
            outs = [jax.lax.conv_general_dilated(
                x, ws[0], (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))]
            outs += [dl.conv3x3_dilated_taps(x, w, (r, r))
                     for w, r in zip(ws[1:], rates)]
            return jnp.concatenate(outs, -1)

        def plain4(x, _w, _d):
            outs = [jax.lax.conv_general_dilated(
                x, ws[0], (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))]
            outs += [jax.lax.conv_general_dilated(
                x, w, (1, 1), ((r, r), (r, r)), rhs_dilation=(r, r),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for w, r in zip(ws[1:], rates)]
            return jnp.concatenate(outs, -1)

        diff = float(_relmax(plain4(x, None, None), merged(x, None, None))[()])
        emit(case=f"aspp_block_b{B}_h{H}", rel_diff=round(diff, 6),
             plain4_ms=round(time_fn(plain4, x, None, None), 4),
             separate_taps_ms=round(time_fn(separate, x, None, None), 4),
             merged_ms=round(time_fn(merged, x, None, None), 4))


if __name__ == "__main__":
    main()
