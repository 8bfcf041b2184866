#!/usr/bin/env python
"""XLA flag ablations on the real chip (VERDICT round-2 item 2).

TPU-backend flags go through ``lowered.compile(compiler_options=...)``
— NOT the XLA_FLAGS env var, whose local parser only knows CPU flags
and LOG(FATAL)s on TPU ones (measured; first version of this script).
Proto-backed options are forwarded per-compile by the axon terminal.
Measures the batch-32 train step and batch-80 eval step per variant.
One JSON line per variant.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

VARIANTS = {
    "baseline": {},
    "latency_hiding_scheduler": {
        "xla_tpu_enable_latency_hiding_scheduler": "true"},
    "scoped_vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "aggressive_fusion": {
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
}


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cavp_tpu.utils.hostfp import set_compile_cache

    set_compile_cache("/tmp/jax_tpu_cache")

    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch, \
        synthetic_train_batch
    from cavp_tpu.engine.loops import (eval_metrics_init, make_eval_step,
                                       make_train_step)
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from _bench_util import zero_train_state, zero_variables

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=32,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, 32).items()}
    rng, ep = jax.random.PRNGKey(0), jnp.asarray(1)
    step_fn = make_train_step(model, tx, config, variant="avss")
    estep_fn = make_eval_step(model, config)
    eb = {k: jnp.asarray(v) for k, v in
          synthetic_eval_batch(config, 80).items()}

    for name, opts in VARIANTS.items():
        row = dict(variant=name, options=opts)
        try:
            state = zero_train_state(model, tx, config, 32)
            lowered = jax.jit(step_fn).lower(state, batch, rng, ep)
            compiled = lowered.compile(compiler_options=opts or None)
            state, m = compiled(state, batch, rng, ep)
            _ = float(m["loss/loss"])
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = compiled(state, batch, rng, ep)
            _ = float(m["loss/loss"])
            dt = (time.perf_counter() - t0) / 10
            row["train_b32_ms"] = round(dt * 1e3, 2)
            row["train_b32_img_s"] = round(32 / dt, 1)

            variables = zero_variables(model)
            em = eval_metrics_init(config.num_classes)
            elow = jax.jit(estep_fn).lower(variables, em, eb)
            ecomp = elow.compile(compiler_options=opts or None)
            em = ecomp(variables, em, eb)
            _ = np.asarray(em.miou_all.inter)
            t0 = time.perf_counter()
            for _ in range(20):
                em = ecomp(variables, em, eb)
            _ = np.asarray(em.miou_all.inter)
            dt = (time.perf_counter() - t0) / 20
            row["eval_b80_ms"] = round(dt * 1e3, 2)
            row["eval_b80_f_s"] = round(80 / dt, 1)
        except Exception as e:
            row["error"] = str(e)[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
