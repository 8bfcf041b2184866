#!/usr/bin/env python
"""Audio-tower (VGGish) attack experiments (VERDICT r3 item 3).

The refreshed round-4 ladder puts the isolated tower at 5.51 ms fwd /
8.25 ms fwd+bwd raw (~2 / ~4.8 ms after the ~3.5 ms tunnel-dispatch
correction) on [64,96,64,1] — the worst *raw* MFU row. This script
localizes where those ms go and measures two reformulations:

  1. per-stage cumulative ladder of the VGG stack (which conv/fc pays);
  2. EXPERIMENT im2col: every 3x3 conv spelled as an explicit
     shifted-tap matmul (9 taps gathered into the contraction dim) —
     does XLA's conv lowering leave matmul throughput on the table at
     these tiny spatial sizes (48x32 .. 12x8)?
  3. EXPERIMENT fc-merge: the three FC layers as one [N,12288] x
     [12288,4096+...] block vs three matmuls (are the small matmuls
     launch/latency-bound?). fc1/fc2 can't fold into fc0 exactly
     (ReLU between), so this measures an upper bound with the
     nonlinearity dropped — a LOWER-bound estimate of possible win.

All rows time with hard scalar syncs, interleaved A/B, same-process.
Prints one JSON line per row. Reference: the tower being rebuilt is
models/audio/backbones/vgg.py:5-36.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

N = 64  # the 2B clip batch of the b32 train step (dedup: 48)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out)) if hasattr(out, "dtype") else None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from cavp_tpu.models.audio_nets import VGGAudio

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, 96, 64, 1).astype(np.float32))

    model = VGGAudio(out_plane=128, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 1)))
    params = variables["params"]

    full = jax.jit(lambda p, a: jnp.sum(
        model.apply({"params": p}, a).astype(jnp.float32)))
    ms_full = timeit(full, params, x)
    emit(what="vgg_fwd_full", n=N, ms=round(ms_full, 3))

    # --- per-stage cumulative ladder ------------------------------------
    cfg = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M")

    def prefix_fn(k_stages):
        def f(p, a):
            h = a.astype(jnp.bfloat16)
            idx = 0
            from cavp_tpu.models.layers import max_pool
            for v in cfg[:k_stages]:
                if v == "M":
                    h = max_pool(h, 2, 2, 0)
                else:
                    w = p[f"conv{idx}"]["kernel"].astype(jnp.bfloat16)
                    b = p[f"conv{idx}"]["bias"].astype(jnp.bfloat16)
                    h = jax.lax.conv_general_dilated(
                        h, w, (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                    h = jax.nn.relu(h)
                    idx += 1
            return jnp.sum(h.astype(jnp.float32))
        return jax.jit(f)

    prev = 0.0
    for k in range(1, len(cfg) + 1):
        ms = timeit(prefix_fn(k), params, x)
        emit(what=f"vgg_prefix_{k}_{cfg[k-1]}", ms=round(ms, 3),
             delta_ms=round(ms - prev, 3))
        prev = ms

    # --- experiment 1: im2col tap-matmul for every 3x3 conv -------------
    def conv_as_taps(h, w, b):
        # w: [3,3,Cin,Cout] -> taps [9*Cin, Cout]; h NHWC padded
        H, W = h.shape[1], h.shape[2]
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [hp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)  # [N,H,W,9*Cin]
        wm = w.transpose(0, 1, 2, 3).reshape(-1, w.shape[-1])
        return jnp.einsum("nhwk,kc->nhwc", patches, wm) + b

    def im2col_tower(p, a):
        from cavp_tpu.models.layers import max_pool
        h = a.astype(jnp.bfloat16)
        idx = 0
        for v in cfg:
            if v == "M":
                h = max_pool(h, 2, 2, 0)
            else:
                w = p[f"conv{idx}"]["kernel"].astype(jnp.bfloat16)
                b = p[f"conv{idx}"]["bias"].astype(jnp.bfloat16)
                h = jax.nn.relu(conv_as_taps(h, w, b))
                idx += 1
        h = h.reshape(h.shape[0], -1)
        for name in ("fc0", "fc1", "fc2"):
            k = p[name]["kernel"].astype(jnp.bfloat16)
            bb = p[name]["bias"].astype(jnp.bfloat16)
            h = jax.nn.relu(h @ k + bb)
        return jnp.sum(h.astype(jnp.float32))

    ms_taps = timeit(jax.jit(im2col_tower), params, x)
    emit(what="vgg_fwd_im2col_tapmatmul", ms=round(ms_taps, 3),
         vs_conv=round(ms_full / ms_taps, 3))

    # equivalence spot-check (bf16 tolerance)
    ref = full(params, x)
    got = jax.jit(im2col_tower)(params, x)
    emit(what="im2col_equiv_relerr",
         rel=float(abs(float(ref) - float(got)) / (abs(float(ref)) + 1e-9)))

    # --- experiment 2: merged-FC upper bound ----------------------------
    def conv_part(p, a):
        from cavp_tpu.models.layers import max_pool
        h = a.astype(jnp.bfloat16)
        idx = 0
        for v in cfg:
            if v == "M":
                h = max_pool(h, 2, 2, 0)
            else:
                w = p[f"conv{idx}"]["kernel"].astype(jnp.bfloat16)
                b = p[f"conv{idx}"]["bias"].astype(jnp.bfloat16)
                h = jax.lax.conv_general_dilated(
                    h, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                h = jax.nn.relu(h)
                idx += 1
        return h.reshape(h.shape[0], -1)

    def fcs_separate(p, a):
        h = conv_part(p, a)
        for name in ("fc0", "fc1", "fc2"):
            k = p[name]["kernel"].astype(jnp.bfloat16)
            bb = p[name]["bias"].astype(jnp.bfloat16)
            h = jax.nn.relu(h @ k + bb)
        return jnp.sum(h.astype(jnp.float32))

    def fcs_merged_nobound(p, a):
        # ReLUs dropped between fcs: NOT equivalent — latency upper
        # bound only (what a single fused matmul chain could buy)
        h = conv_part(p, a)
        k = (p["fc0"]["kernel"].astype(jnp.bfloat16)
             @ p["fc1"]["kernel"].astype(jnp.bfloat16)
             @ p["fc2"]["kernel"].astype(jnp.bfloat16))
        return jnp.sum((h @ k).astype(jnp.float32))

    ms_sep = timeit(jax.jit(fcs_separate), params, x)
    ms_mrg = timeit(jax.jit(fcs_merged_nobound), params, x)
    emit(what="fc_separate_vs_merged_bound", separate_ms=round(ms_sep, 3),
         merged_bound_ms=round(ms_mrg, 3),
         headroom_ms=round(ms_sep - ms_mrg, 3))


if __name__ == "__main__":
    main()
