#!/usr/bin/env python
"""Token-block sweep for the eval fusion Pallas kernel at the b120
headline. `_pick_block` chooses the largest sublane-aligned divisor of
N=3136 under 1024 (-> 784); this asks whether a smaller block (more
grid parallelism / smaller VMEM residency) wins at the shipping batch.
Exact either way — the kernel is block-wise over tokens. Full eval
steps, interleaved best-of-3, one JSON line per arm.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np
import jax

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

BATCH = 120
BLOCKS = (224, 448, 784)   # sublane-aligned divisors of 3136 (bf16)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import eval_bench_setup, headline_eval_config
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.ops.pallas import fusion_kernel

    config = headline_eval_config()
    model, variables, _, batch, _ = eval_bench_setup(config, BATCH)

    real = fusion_kernel.fused_visual_fusion
    arms = {}
    for blk in BLOCKS:
        # make_eval_step's closure does a function-local
        # `from ...fusion_kernel import fused_visual_fusion` when it is
        # BUILT, so patching the kernel module's attribute before the
        # build is the (one) effective patch point.
        fusion_kernel.fused_visual_fusion = functools.partial(
            real, block_tokens=blk)
        try:
            step = jax.jit(make_eval_step(model, config))
            m = eval_metrics_init(config.num_classes)
            t0 = time.perf_counter()
            m = step(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            emit(arm=f"block_{blk}",
                 first_call_s=round(time.perf_counter() - t0, 1))
            arms[blk] = step
        finally:
            fusion_kernel.fused_visual_fusion = real

    iters = 14
    results = {b: [] for b in arms}
    for _w in range(3):
        for blk, step in arms.items():
            m = eval_metrics_init(config.num_classes)
            m = step(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            t0 = time.perf_counter()
            for _ in range(iters):
                m = step(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            results[blk].append((time.perf_counter() - t0) / iters)

    base = BATCH / min(results[784])
    for blk in BLOCKS:
        best = min(results[blk])
        fps = BATCH / best
        emit(arm=f"block_{blk}", step_ms=round(best * 1e3, 2),
             fps=round(fps, 1),
             vs_784_pct=round((fps / base - 1) * 100, 2),
             windows_ms=[round(d * 1e3, 2) for d in results[blk]])


if __name__ == "__main__":
    main()
