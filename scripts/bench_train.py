#!/usr/bin/env python
"""Train-step throughput + fused-mel micro-benchmark on the real chip.

VERDICT round-1 items 2/3: measure (not estimate) the train step at
batch 16/32/64 with the vectorized SoundBank, derive MFU from the
compiled HLO's own cost analysis, and decide the Pallas mel question
with a number. Prints one JSON line per measurement so partial progress
survives interrupts.

Timing uses hard host transfers (float()/np.asarray) as the sync point;
block_until_ready under-reports on the axon transport (CLAUDE.md).
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

V5E_BF16_PEAK = 197e12  # flops/s, one v5e chip


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_mel():
    from cavp_tpu.audio.mel import preprocess_audio

    N = 160  # 2x the eval bench batch of 80 clips
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(N, 1, 16000).astype(np.float32))

    for use_pallas in (False, True):
        fn = jax.jit(lambda w: preprocess_audio(
            w, n_frames=96, use_pallas=use_pallas))
        out = fn(wave)
        _ = np.asarray(out)  # compile + sync
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(wave)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        emit(metric="mel_frontend_us_per_clip",
             variant="pallas" if use_pallas else "xla",
             value=round(dt / iters / N * 1e6, 2), unit="us/clip",
             clips_per_sec=round(N * iters / dt, 1))


def bench_train(batch_sizes=(16, 32, 64)):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    for bs in batch_sizes:
        # best shipping train config: fused train-path fusion kernel
        # (+8.4% b32 A/B, scripts/bench_fusion_train_ab.py)
        config = get_config("avss").replace(
            image_width=224, image_height=224, batch_size=bs,
            compute_dtype="bfloat16", use_pallas_fusion_train=True)
        model = build_model(config)
        tx, _ = make_optimizer(config)

        from _bench_util import zero_train_state

        state = zero_train_state(model, tx, config, bs)

        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_train_batch(config, bs).items()}
        rng = jax.random.PRNGKey(0)
        epoch = jnp.asarray(1)  # overwrite + bank path active

        # donate state like the production step (engine/runner.py) —
        # the measured program should be the shipping program
        step = jax.jit(make_train_step(model, tx, config, variant="avss"),
                       donate_argnums=(0,))
        t_c0 = time.perf_counter()
        lowered = step.lower(state, batch, rng, epoch)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t_c0
        flops = None
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops")
        except Exception:
            pass

        state, metrics = compiled(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])  # sync
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = compiled(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])
        dt = time.perf_counter() - t0
        step_s = dt / iters
        out = dict(metric="avss224_train_img_per_sec_per_chip",
                   batch_size=bs, value=round(bs / step_s, 1),
                   unit="img/s/chip", step_ms=round(step_s * 1e3, 1),
                   compile_s=round(compile_s, 1))
        if flops:
            out["hlo_tflops_per_step"] = round(flops / 1e12, 2)
            out["mfu_pct"] = round(flops / step_s / V5E_BF16_PEAK * 100, 1)
        emit(**out)


if __name__ == "__main__":
    # optional: batch sizes as argv (e.g. `bench_train.py 32 48 64 96`
    # re-sweeps the train batch — the fused train kernel removed the
    # fusion stage's AD stashes, changing the memory profile the
    # original 16/32/64 sweep was run under). No argv = full run.
    if len(sys.argv) > 1:
        emit(stage="train")
        bench_train(tuple(int(a) for a in sys.argv[1:]))
    else:
        emit(stage="mel")
        bench_mel()
        emit(stage="train")
        bench_train()
