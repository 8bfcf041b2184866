#!/usr/bin/env python
"""avss-512 (the reference's canonical non-resize config,
config_avss.py:9-77) train + eval-forward throughput on the real chip."""

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

V5E_BF16_PEAK = 197e12


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import zero_train_state, zero_variables
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    BS = 8
    config = get_config("avss").replace(
        image_width=512, image_height=512, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    state = zero_train_state(model, tx, config, BS)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

    step = jax.jit(make_train_step(model, tx, config, variant="avss"))
    c = step.lower(state, batch, rng, epoch).compile()
    flops = None
    try:
        ca = c.cost_analysis()
        flops = (ca[0] if isinstance(ca, list) else ca).get("flops")
    except Exception:
        pass
    s, m = c(state, batch, rng, epoch)
    _ = float(m["loss/loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        s, m = c(s, batch, rng, epoch)
    _ = float(m["loss/loss"])
    dt = (time.perf_counter() - t0) / 10
    out = dict(metric="avss512_train_img_per_sec_per_chip", batch_size=BS,
               value=round(BS / dt, 1), step_ms=round(dt * 1e3, 1))
    if flops:
        out["mfu_pct"] = round(flops / dt / V5E_BF16_PEAK * 100, 1)
    emit(**out)

    # eval forward
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    audio = jnp.zeros((BS, 96, 64, 1), jnp.float32)
    fwd = jax.jit(lambda v, i, a: model.apply(v, i, a, eval_mode=True)[0])
    cf = fwd.lower(variables, batch["image"], audio).compile()
    flops = None
    try:
        ca = cf.cost_analysis()
        flops = (ca[0] if isinstance(ca, list) else ca).get("flops")
    except Exception:
        pass
    o = cf(variables, batch["image"], audio)
    _ = float(o.sum())
    t0 = time.perf_counter()
    for _ in range(10):
        o = cf(variables, batch["image"], audio)
    _ = float(o.sum())
    dt = (time.perf_counter() - t0) / 10
    out = dict(metric="avss512_eval_fwd_frames_per_sec", batch_size=BS,
               value=round(BS / dt, 1), step_ms=round(dt * 1e3, 1))
    if flops:
        out["mfu_pct"] = round(flops / dt / V5E_BF16_PEAK * 100, 1)
    emit(**out)

    # eval forward through the fused Pallas fusion kernel (round 3)
    from cavp_tpu.engine.loops import make_inference_forward
    infer = make_inference_forward(model,
                                   config.replace(use_pallas_fusion=True))
    fwd_pl = jax.jit(lambda v, i, a: jnp.sum(infer(v, i, a)
                                             .astype(jnp.float32)))
    s = float(fwd_pl(variables, batch["image"], audio))
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd_pl(variables, batch["image"], audio)
    s = float(o)  # one hard sync after the loop, as the row above
    dt = (time.perf_counter() - t0) / 10
    emit(metric="avss512_eval_fwd_frames_per_sec", variant="pallas_fusion",
         batch_size=BS, value=round(BS / dt, 1),
         step_ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
