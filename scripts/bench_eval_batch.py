#!/usr/bin/env python
"""Eval-step batch-size sweep (headline lever check).

bench.py's headline runs the batched eval step at B=80 (8 videos x 10
frames). Larger device batches amortize per-step fixed work (mel,
audio tower on few clips, metric finalization) and may tile the conv
tower better; smaller ones cut padding waste on ragged tails. This
sweeps B and reports frames/sec for each — the best value feeds back
into bench.py/serving defaults with the dense-repacking logic
unchanged (any B is one compiled shape).

One JSON line per batch size; same methodology as bench.py (pipelined
iterations, one hard sync per window).
"""

import json
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def main():
    from _bench_util import (eval_bench_setup, headline_eval_config,
                             timed_eval_fps)
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init

    config = headline_eval_config()
    model, variables, eval_step, _, _ = eval_bench_setup(config, 1)
    results = {}
    for B in (40, 80, 120, 160, 240):
        try:
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_eval_batch(config, B).items()}
            metrics = eval_metrics_init(config.num_classes)
            best = timed_eval_fps(eval_step, variables, batch, metrics, B)
            results[B] = best
            print(json.dumps({"what": "eval_batch_sweep", "batch": B,
                              "frames_per_sec": round(best, 1)}),
                  flush=True)
        except Exception as exc:
            print(json.dumps({"what": "eval_batch_sweep", "batch": B,
                              "error": str(exc)[:200]}), flush=True)
    if results:
        bestB = max(results, key=results.get)
        print(json.dumps({"what": "eval_batch_sweep_best", "batch": bestB,
                          "frames_per_sec": round(results[bestB], 1),
                          "vs_b80": round(results[bestB]
                                          / results.get(80, results[bestB]),
                                          3)}), flush=True)


if __name__ == "__main__":
    main()
