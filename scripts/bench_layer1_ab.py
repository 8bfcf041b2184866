#!/usr/bin/env python
"""In-context A/B for the fused layer1 residual-stage Pallas kernel.

The visual-tower ladder (docs/performance.md) names layer1 the
bandwidth-bound row: ~8 ms real at 5% MFU for b80 eval — three
bottleneck blocks at 56-sq whose BN/ReLU/residual HBM round-trips dwarf
their thin 64-channel matmuls. The kernel
(cavp_tpu/ops/pallas/layer1_kernel.py) runs the whole stage in one VMEM
pass per image. This script times the full headline eval step
(use_pallas_fusion on, the bench.py configuration) with
use_pallas_layer1 off vs on — the keep/flip-the-default number.
"""

import json
import sys

sys.path.insert(0, ".")

import jax

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

B = 120


def run(config, model, variables, batch):
    from _bench_util import timed_eval_fps
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step

    eval_step = jax.jit(make_eval_step(model, config))
    metrics = eval_metrics_init(config.num_classes)
    return timed_eval_fps(eval_step, variables, batch, metrics, B)


def main():
    from _bench_util import eval_bench_setup, headline_eval_config

    base = headline_eval_config()
    # ones_batch_stats: the kernel arm folds BN — zero running vars give
    # a huge folded scale; make them 1.0 so both arms see realistic
    # magnitudes.
    model, variables, _, batch, _ = eval_bench_setup(
        base, B, ones_batch_stats=True)

    off = run(base, model, variables, batch)
    print(json.dumps({"what": "layer1_ab", "use_pallas_layer1": False,
                      "batch": B, "frames_per_sec": round(off, 1)}),
          flush=True)
    on = run(base.replace(use_pallas_layer1=True), model, variables, batch)
    print(json.dumps({"what": "layer1_ab", "use_pallas_layer1": True,
                      "batch": B, "frames_per_sec": round(on, 1)}),
          flush=True)
    print(json.dumps({"what": "layer1_ab_summary",
                      "off_fps": round(off, 1), "on_fps": round(on, 1),
                      "speedup_pct": round(100.0 * (on - off) / off, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
