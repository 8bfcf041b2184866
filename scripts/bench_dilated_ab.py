#!/usr/bin/env python
"""Same-run A/B of the dilated-conv tap decomposition in context.

Times the full batch-80 avss-224 eval step and the batch-32 train step
with ops.dilated.ENABLED toggled, interleaved A/B/A/B in one process so
transport drift cancels (the methodology the upsample+argmax ablation
settled on). Prints one JSON line per measurement.
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.ops import dilated

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    model = build_model(config)
    image = jnp.zeros((1, 224, 224, 3), jnp.float32)
    audio = jnp.zeros((1, 96, 64, 1), jnp.float32)
    shapes = jax.eval_shape(lambda r: model.init(r, image, audio,
                                                 eval_mode=True),
                            jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    BATCH = 80
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_eval_batch(config, BATCH).items()}

    # Two jitted eval steps, traced under each ENABLED value (the gate is
    # a trace-time branch, so each trace bakes its path in).
    steps = {}
    for enabled in (True, False):
        dilated.ENABLED = enabled
        steps[enabled] = jax.jit(make_eval_step(model, config))
        m = eval_metrics_init(config.num_classes)
        m = steps[enabled](variables, m, batch)
        _ = np.asarray(m.miou_all.inter)  # compile + warm

    def time_eval(step, iters=20):
        m = eval_metrics_init(config.num_classes)
        m = step(variables, m, batch)
        _ = np.asarray(m.miou_all.inter)
        t0 = time.perf_counter()
        for _ in range(iters):
            m = step(variables, m, batch)
        _ = np.asarray(m.miou_all.inter)
        return (time.perf_counter() - t0) / iters * 1e3

    # interleaved rounds
    on_ms, off_ms = [], []
    for _ in range(3):
        on_ms.append(time_eval(steps[True]))
        off_ms.append(time_eval(steps[False]))
    emit(what="eval_step_b224_b80_ms", taps_on=round(min(on_ms), 3),
         taps_off=round(min(off_ms), 3),
         fps_on=round(BATCH / min(on_ms) * 1e3, 1),
         fps_off=round(BATCH / min(off_ms) * 1e3, 1))

    # ---- train step b32
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from _bench_util import zero_train_state
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer

    B = 32
    tcfg = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        batch_size=B)
    tmodel = build_model(tcfg)
    tx, _ = make_optimizer(tcfg)
    tbatch = {k: jnp.asarray(v) for k, v in
              synthetic_train_batch(tcfg, B).items()}
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(1)

    tsteps = {}
    for enabled in (True, False):
        dilated.ENABLED = enabled
        state = zero_train_state(tmodel, tx, tcfg, B)
        fn = jax.jit(make_train_step(tmodel, tx, tcfg, variant="avss"))
        st, metrics = fn(state, tbatch, rng, epoch)
        _ = float(metrics["loss/loss"])  # compile + warm
        tsteps[enabled] = (fn, st)

    def time_train(fn_state, iters=15):
        fn, state = fn_state
        st, metrics = fn(state, tbatch, rng, epoch)
        _ = float(metrics["loss/loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = fn(st, tbatch, rng, epoch)
        _ = float(metrics["loss/loss"])
        return (time.perf_counter() - t0) / iters * 1e3

    on_ms, off_ms = [], []
    for _ in range(3):
        on_ms.append(time_train(tsteps[True]))
        off_ms.append(time_train(tsteps[False]))
    emit(what="train_step_b224_b32_ms", taps_on=round(min(on_ms), 3),
         taps_off=round(min(off_ms), 3),
         imgs_on=round(B / min(on_ms) * 1e3, 1),
         imgs_off=round(B / min(off_ms) * 1e3, 1))


if __name__ == "__main__":
    main()
