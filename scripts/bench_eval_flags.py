#!/usr/bin/env python
"""Compiler-option A/B on the EXACT headline eval step (b120, Pallas
fusion kernel on) — the round-3 flag ablations predate both the kernel
and the b120 batch, so the flag question is re-asked on the shipping
program. TPU flags go per-compile via ``compiler_options`` (XLA_FLAGS
LOG(FATAL)s on the client parser — docs/performance.md).

Interleaved best-of-3 windows, hard scalar syncs. One JSON line/arm.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

import jax

from _bench_util import eval_bench_setup, headline_eval_config
from cavp_tpu.engine.loops import eval_metrics_init

ARMS = {
    "baseline": None,
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "aggressive_fusion": {
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "both": {"xla_tpu_enable_latency_hiding_scheduler": "true",
             "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
}

BATCH = 120


def main():
    config = headline_eval_config()
    model, variables, _, batch, _ = eval_bench_setup(config, BATCH)

    from cavp_tpu.engine.loops import make_eval_step

    step_fn = make_eval_step(model, config)
    compiled = {}
    for name, opts in ARMS.items():
        m = eval_metrics_init(config.num_classes)
        t0 = time.perf_counter()
        c = jax.jit(step_fn).lower(variables, m, batch).compile(
            compiler_options=opts)
        print(json.dumps({"arm": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        m = c(variables, m, batch)
        _ = np.asarray(m.miou_all.inter)      # warm + sync
        compiled[name] = c

    iters = 14
    results = {n: [] for n in compiled}
    for _w in range(3):
        for name, c in compiled.items():
            m = eval_metrics_init(config.num_classes)
            m = c(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            t0 = time.perf_counter()
            for _ in range(iters):
                m = c(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            results[name].append((time.perf_counter() - t0) / iters)

    base = None
    for name, dts in results.items():
        best = min(dts)
        fps = BATCH / best
        if name == "baseline":
            base = fps
        print(json.dumps({
            "arm": name, "step_ms": round(best * 1e3, 2),
            "fps": round(fps, 1),
            "vs_baseline_pct": round((fps / base - 1) * 100, 2)
            if base else 0.0,
            "windows_ms": [round(d * 1e3, 2) for d in dts]}), flush=True)


if __name__ == "__main__":
    main()
