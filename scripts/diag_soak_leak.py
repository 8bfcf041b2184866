#!/usr/bin/env python
"""Isolate the ~215 KB/request RSS growth the serving soak surfaced.

Arms (each ITERS iterations, RSS sampled every 50):
  a. transfer_only — device->host np.asarray of a [1,224,224] int32
     (the mask's exact size) from a trivial jitted fn; no Predictor.
  b. predict_gc    — the full Predictor.predict loop with an explicit
     gc.collect() every 50 (distinguishes cycle-lag from a real leak).
  c. predict_plain — the full loop, no forced gc (the soak's shape).

If (a) grows too, the growth is transport/plugin-side (per-execution
host buffers in the tunneled PJRT client), not serving-path Python.
One JSON line per sample; one summary line per arm.
"""

import gc
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 600


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run(name, fn, every_gc=None):
    rss0 = None
    samples = []
    for i in range(ITERS):
        fn(i)
        if every_gc and i % every_gc == every_gc - 1:
            gc.collect()
        if i % 50 == 49:
            r = rss_mb()
            samples.append(r)
            if rss0 is None:
                rss0 = r
    growth = samples[-1] - samples[len(samples) // 2]
    per_iter_kb = growth * 1024 / (ITERS / 2)
    emit(arm=name, rss_first=round(samples[0], 1),
         rss_last=round(samples[-1], 1),
         steady_growth_mb=round(growth, 1),
         per_iter_kb=round(per_iter_kb, 1))


def main():
    # ---- arm a: pure transfer
    @jax.jit
    def trivial(x):
        return (x + 1).astype(jnp.int32)

    seed = jnp.zeros((1, 224, 224), jnp.int32)
    _ = np.asarray(trivial(seed))

    def xfer(_i):
        _ = np.asarray(trivial(seed))

    run("transfer_only", xfer)

    # ---- Predictor arms
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.predictor import Predictor

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    p = Predictor(config, batch_sizes=(1,)).warmup()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    wav = rng.randn(1, 1, config.audio_samples).astype(np.float32)

    def pred(_i):
        _ = p.predict(img, wav)

    run("predict_gc", pred, every_gc=50)
    run("predict_plain", pred)


if __name__ == "__main__":
    main()
