#!/usr/bin/env python
"""Donated-state train step (the runner's real configuration) and
Predictor serving latency percentiles on the real chip."""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np
import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_donated_train():
    from _bench_util import zero_train_state
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    BS = 64
    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

    for donate in (False, True):
        state = zero_train_state(model, tx, config, BS)
        step = jax.jit(make_train_step(model, tx, config, variant="avss"),
                       donate_argnums=(0,) if donate else ())
        s, m = step(state, batch, rng, epoch)
        _ = float(m["loss/loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            s, m = step(s, batch, rng, epoch)
        _ = float(m["loss/loss"])
        dt = (time.perf_counter() - t0) / 10
        emit(metric="train_b64", donated=donate,
             img_per_s=round(BS / dt, 1), step_ms=round(dt * 1e3, 1))


def bench_predictor():
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.predictor import Predictor

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    p = Predictor(config, batch_sizes=(1, 8)).warmup()
    rng = np.random.RandomState(0)
    for b in (1, 8):
        imgs = rng.randint(0, 255, (b, 224, 224, 3), dtype=np.uint8)
        wavs = rng.randn(b, 1, config.audio_samples).astype(np.float32)
        lats = []
        p.predict(imgs, wavs)  # warm
        for _ in range(30):
            t0 = time.perf_counter()
            _ = p.predict(imgs, wavs)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        emit(metric="predictor_latency_ms", batch=b,
             p50=round(lats[len(lats) // 2], 1),
             p90=round(lats[int(len(lats) * 0.9)], 1),
             min=round(lats[0], 1))


if __name__ == "__main__":
    bench_donated_train()
    bench_predictor()
