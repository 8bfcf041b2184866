#!/usr/bin/env python
"""Does the pipelined eval loop leave any host-dispatch gap at b120?

Arms: (a) the headline loop — N independent eval_step dispatches with
one hard sync per window (how bench.py measures and how run_validation
executes); (b) a `lax.scan` of the same step over K stacked batches
inside ONE jit — zero per-step dispatch by construction. If (b) wins,
the gap is host dispatch; if it ties, the async-dispatch pipeline is
already gap-free and the headline number is device-bound. One JSON
line per arm.
"""

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

BATCH = 120
K = 5          # scanned steps per dispatch


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import eval_bench_setup, headline_eval_config
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step

    config = headline_eval_config()
    model, variables, eval_step, batch, _ = eval_bench_setup(config, BATCH)

    # ---- arm A: dispatch loop (the headline harness)
    m = eval_step(variables, eval_metrics_init(config.num_classes), batch)
    _ = np.asarray(m.miou_all.inter)
    iters = 15
    best = float("inf")
    for _w in range(3):
        m = eval_metrics_init(config.num_classes)
        t0 = time.perf_counter()
        for _ in range(iters):
            m = eval_step(variables, m, batch)
        _ = np.asarray(m.miou_all.inter)
        best = min(best, (time.perf_counter() - t0) / iters)
    emit(arm="dispatch_loop", step_ms=round(best * 1e3, 2),
         fps=round(BATCH / best, 1))
    base = BATCH / best

    # ---- arm B: lax.scan over K stacked batches, one dispatch
    step_fn = make_eval_step(model, config)
    stacked = {k: jnp.stack([v] * K) for k, v in batch.items()}

    @jax.jit
    def scanned(variables, metrics, stacked):
        def body(ms, b):
            return step_fn(variables, ms, b), None
        out, _ = jax.lax.scan(body, metrics, stacked)
        return out

    m = scanned(variables, eval_metrics_init(config.num_classes), stacked)
    _ = np.asarray(m.miou_all.inter)
    reps = 3
    best = float("inf")
    for _w in range(3):
        m = eval_metrics_init(config.num_classes)
        t0 = time.perf_counter()
        for _ in range(reps):
            m = scanned(variables, m, stacked)
        _ = np.asarray(m.miou_all.inter)
        best = min(best, (time.perf_counter() - t0) / (reps * K))
    fps = BATCH / best
    emit(arm="scanned_x5", step_ms=round(best * 1e3, 2),
         fps=round(fps, 1),
         vs_loop_pct=round((fps / base - 1) * 100, 2))


if __name__ == "__main__":
    main()
