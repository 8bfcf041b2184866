#!/usr/bin/env python
"""Probe: is the backward of stride-2 3x3 convs paying transposed-conv
zero-stuffing waste on this chip?

The input-gradient of a stride-2 conv is a lhs_dilated (transposed)
conv: the 28^2 cotangent is zero-stuffed to 56^2 (3/4 zeros) before the
3x3 window reduction — a naive lowering wastes ~4x MACs. XLA may or may
not rewrite this into per-phase subpixel convs on TPU. Measures, for
the tower's stride-2 shapes:

  A. grad-input through conv_general_dilated stride 2 (the real path)
  B. a dense stride-1 conv with the same *useful* FLOPs (lower bound)

If A ~= B, XLA already lowers the transpose efficiently and there is
nothing to build. If A >> B, a custom_vjp phase-decomposed backward is
worth landing. One JSON line per case.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

REPS = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_fn(g, *args, iters=20):
    out = g(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters / REPS * 1e3


def main():
    dt = jnp.bfloat16
    # (name, B, Hin, Cin, Cout) for the stride-2 3x3 convs in the tower
    cases = [
        ("layer2_conv2_b32", 32, 56, 128, 128),
        ("layer3_conv2_b32", 32, 28, 256, 256),
        ("stem_conv1_b32", 32, 224, 64, 64),  # ch-equalized stand-in
    ]
    for name, B, H, Ci, Co in cases:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        k1, k2, k3 = jax.random.split(key, 3)
        x = (jax.random.normal(k1, (B, H, H, Ci), jnp.float32) * 0.5).astype(dt)
        w = (jax.random.normal(k2, (3, 3, Ci, Co), jnp.float32) * 0.02).astype(dt)
        Ho = H // 2
        cot = (jax.random.normal(k3, (B, Ho, Ho, Co), jnp.float32)).astype(dt)

        def conv_s2(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def gradx_loss(x, w, cot):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                gx = jax.vjp(lambda xx: conv_s2(xx, w), x * (1.0 + i * 1e-3))[1](cot)[0]
                acc += jnp.sum(gx.astype(jnp.float32))
            return acc

        g_real = jax.jit(gradx_loss)

        # lower bound: a dense stride-1 conv at the small resolution with
        # the same useful FLOP count (Ho^2 * 9 * Ci * Co), reading/writing
        # comparable bytes
        xs = (jax.random.normal(k1, (B, Ho, Ho, Co), jnp.float32)).astype(dt)
        ws = (jax.random.normal(k2, (3, 3, Co, Ci), jnp.float32) * 0.02).astype(dt)

        def dense_small(xs, ws):
            acc = jnp.zeros((), jnp.float32)
            for i in range(REPS):
                y = jax.lax.conv_general_dilated(
                    xs * (1.0 + i * 1e-3), ws, window_strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                acc += jnp.sum(y.astype(jnp.float32))
            return acc

        g_lb = jax.jit(dense_small)
        # NOTE: the lower bound writes [B,Ho,Ho,Ci] vs grad's [B,H,H,Ci]
        # (4x fewer output bytes) — treat small gaps as inconclusive.
        real_ms = time_fn(g_real, x, w, cot)
        lb_ms = time_fn(g_lb, xs, ws)
        emit(case=name, grad_input_ms=round(real_ms, 4),
             dense_lb_ms=round(lb_ms, 4),
             ratio=round(real_ms / max(lb_ms, 1e-9), 3))


if __name__ == "__main__":
    main()
