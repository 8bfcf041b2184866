#!/usr/bin/env python
"""Same-run A/B of the decomposed-MLP fusion dedup in context.

Times the batch-32 avss-224 train step with config.fusion_mlp_dedup
toggled (the MLP fc1 contraction on B vs the duplicated 2B),
interleaved A/B/A/B in one process so transport drift cancels.
Exactness is pinned separately (tests/test_models.py
TestFusionMlpDedup); this script measures the in-context win.
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

    B = int(os.environ.get("BENCH_BATCH", "32"))
    base = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        batch_size=B)
    tx, _ = make_optimizer(base)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(base, B).items()}
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(1)

    steps = {}
    for dedup in (True, False):
        cfg = base.replace(fusion_mlp_dedup=dedup)
        model = build_model(cfg)  # the toggle lives on the model
        state = zero_train_state(model, tx, cfg, B)
        fn = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
        st, metrics = fn(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])  # compile + warm
        steps[dedup] = (fn, st)

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
    emit(what=f"train_step_224_b{B}_ms",
         dedup_on=round(min(on_ms), 3), dedup_off=round(min(off_ms), 3),
         imgs_on=round(B / min(on_ms) * 1e3, 1),
         imgs_off=round(B / min(off_ms) * 1e3, 1),
         ow_rate=base.ow_rate)


if __name__ == "__main__":
    main()
