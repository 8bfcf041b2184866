#!/usr/bin/env python
"""Same-run A/B of the stride-2 phase-decomposed backward in context.

Times the batch-32 avss-224 train step with ops.stride2.ENABLED
toggled, interleaved A/B rounds in one process so transport drift
cancels (the bench_dilated_ab.py methodology). Forward path is
identical under both traces — only the input-gradient lowering of the
stride-2 3x3 convs differs. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import zero_train_state
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.ops import stride2

    B = 32
    cfg = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        batch_size=B)
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(cfg, B).items()}
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(1)

    steps = {}
    for enabled in (True, False):
        stride2.ENABLED = enabled
        state = zero_train_state(model, tx, cfg, B)
        fn = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
        st, metrics = fn(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])  # compile + warm
        steps[enabled] = (fn, st)

    def time_train(fn_state, iters=15):
        fn, state = fn_state
        st, metrics = fn(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = fn(st, batch, rng, epoch)
        _ = float(metrics["loss/loss"])
        return (time.perf_counter() - t0) / iters * 1e3

    on_ms, off_ms = [], []
    for _ in range(3):
        on_ms.append(time_train(steps[True]))
        off_ms.append(time_train(steps[False]))
    emit(what="train_step_224_b32_ms", s2_on=round(min(on_ms), 3),
         s2_off=round(min(off_ms), 3),
         imgs_on=round(B / min(on_ms) * 1e3, 1),
         imgs_off=round(B / min(off_ms) * 1e3, 1))


if __name__ == "__main__":
    main()
