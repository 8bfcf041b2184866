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
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    model = build_model(config)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 224, 224, 3), jnp.float32),
                             jnp.zeros((1, 96, 64, 1), jnp.float32),
                             eval_mode=True),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    eval_step = jax.jit(make_eval_step(model, config))
    results = {}
    for B in (40, 80, 120, 160, 240):
        try:
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_eval_batch(config, B).items()}
            metrics = eval_metrics_init(config.num_classes)
            metrics = eval_step(variables, metrics, batch)
            _ = np.asarray(metrics.miou_all.inter)
            best = 0.0
            for _rep in range(3):
                n_iters = max(4, 1600 // B)
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    metrics = eval_step(variables, metrics, batch)
                _ = np.asarray(metrics.miou_all.inter)
                dt = time.perf_counter() - t0
                best = max(best, B * n_iters / dt)
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
