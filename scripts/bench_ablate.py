#!/usr/bin/env python
"""Train-step time decomposition on the real chip (profiler traces hang
over the axon transport, so this uses component ablations instead):

  full        : CAVP train step (CE + CoroCL + banks), batch 32
  no_corocl   : same step with corocl_loss stubbed to 0 (isolates the
                sampling top_k + InfoNCE matmul + their backward)
  baseline_ce : VisualModel CE-only train step (isolates audio tower +
                fusion + duplicate-batch cost)
  eval_fwd    : CAVP inference forward (the eval bench's per-frame work)

Prints one JSON line per variant.
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

V5E_BF16_PEAK = 197e12
BS = 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_state(model, tx, config):
    from _bench_util import zero_train_state

    return zero_train_state(model, tx, config, BS)


def time_step(compiled, *args, sync):
    out = compiled(*args)
    _ = sync(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _ = sync(out)
    return (time.perf_counter() - t0) / iters


def flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops")
    except Exception:
        return None


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine import loops
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    state = make_state(model, tx, config)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(1)

    def report(name, step_s, flops):
        out = dict(variant=name, step_ms=round(step_s * 1e3, 1),
                   img_per_s=round(BS / step_s, 1))
        if flops:
            out["hlo_tflops"] = round(flops / 1e12, 2)
            out["mfu_pct"] = round(flops / step_s / V5E_BF16_PEAK * 100, 1)
        emit(**out)

    # full
    step = jax.jit(loops.make_train_step(model, tx, config, variant="avss"))
    c = step.lower(state, batch, rng, epoch).compile()
    report("full", time_step(c, state, batch, rng, epoch,
                             sync=lambda o: float(o[1]["loss/loss"])),
           flops_of(c))

    # no_corocl: stub the loss out inside the step builder
    real = loops.corocl_loss
    loops.corocl_loss = lambda *a, **k: (jnp.float32(0.0), {})
    try:
        step2 = jax.jit(loops.make_train_step(model, tx, config,
                                              variant="avss"))
        c2 = step2.lower(state, batch, rng, epoch).compile()
        report("no_corocl", time_step(c2, state, batch, rng, epoch,
                                      sync=lambda o: float(o[1]["loss/loss"])),
               flops_of(c2))
    finally:
        loops.corocl_loss = real

    # baseline CE-only (VisualModel)
    bmodel = build_model(config, baseline=True)
    btx, _ = make_optimizer(config)
    bstate = make_state(bmodel, btx, config)
    bstep = jax.jit(loops.make_train_step(bmodel, btx, config,
                                          variant="baseline"))
    c3 = bstep.lower(bstate, batch, rng, epoch).compile()
    report("baseline_ce", time_step(c3, bstate, batch, rng, epoch,
                                    sync=lambda o: float(o[1]["loss/loss"])),
           flops_of(c3))

    # eval forward at the same batch
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    audio = jnp.zeros((BS, 96, 64, 1), jnp.float32)
    fwd = jax.jit(lambda v, img, aud: model.apply(v, img, aud,
                                                  eval_mode=True)[0])
    c4 = fwd.lower(variables, batch["image"], audio).compile()
    report("eval_fwd", time_step(c4, variables, batch["image"], audio,
                                 sync=lambda o: float(o.sum())),
           flops_of(c4))


if __name__ == "__main__":
    main()
