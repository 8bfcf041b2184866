#!/usr/bin/env python
"""Re-ask the fused upsample+argmax kernel question at the b120 headline.

The round-3 verdict (docs/performance.md recorded ablations) was
"negative in context at b80": XLA overlaps the ~570 MB logits HBM
round-trip with the metric one-hot matmuls, while the kernel serializes
ahead of them. But the round-4 batch sweep moved the headline to B=120
*because* beyond it "the metric block's one-hot matmul operands outgrow
what XLA overlaps with the tower" — i.e. at b120 the overlap budget is
near-exhausted, which is exactly the regime where removing the logits
round-trip could flip the tradeoff. Interleaved best-of-3 full eval
steps, both arms on the Pallas fusion kernel. One JSON line per arm.
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import eval_bench_setup, headline_eval_config
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step

    arms = {}
    for name, flag in (("xla_argmax", False), ("pallas_argmax", True)):
        config = headline_eval_config(use_pallas_argmax=flag)
        model, variables, _, batch, _ = eval_bench_setup(config, BATCH)
        step = jax.jit(make_eval_step(model, config))
        m = eval_metrics_init(config.num_classes)
        t0 = time.perf_counter()
        m = step(variables, m, batch)
        _ = np.asarray(m.miou_all.inter)
        emit(arm=name, first_call_s=round(time.perf_counter() - t0, 1))
        arms[name] = (step, variables, batch, config)

    # numeric check: identical metric accumulators on NON-degenerate
    # logits — zero-built variables give class-constant logits, which
    # would only exercise argmax tie-breaking. Noise-filled params +
    # unit BN running vars give distinct per-class logits; the kernel is
    # additionally pinned bitwise in its unit tests.
    ref = next(iter(arms.values()))[1]
    key = jax.random.PRNGKey(42)
    leaves, treedef = jax.tree_util.tree_flatten(ref["params"])
    noisy = {
        "params": jax.tree_util.tree_unflatten(treedef, [
            (jax.random.normal(jax.random.fold_in(key, i), l.shape,
                               l.dtype) * 0.05
             if jnp.issubdtype(l.dtype, jnp.floating) else l)
            for i, l in enumerate(leaves)]),
        "batch_stats": jax.tree_util.tree_map(
            jnp.ones_like, ref.get("batch_stats", {})),
    }
    accs = {}
    for name, (step, _variables, batch, config) in arms.items():
        m = step(noisy, eval_metrics_init(config.num_classes), batch)
        accs[name] = np.asarray(m.miou_all.inter)
    assert accs["xla_argmax"].sum() > 0, "degenerate check input"
    np.testing.assert_array_equal(accs["xla_argmax"], accs["pallas_argmax"])
    emit(check="metric_accumulators_identical_nondegenerate")

    iters = 14
    results = {n: [] for n in arms}
    for _w in range(3):
        for name, (step, variables, batch, config) in arms.items():
            m = eval_metrics_init(config.num_classes)
            m = step(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            t0 = time.perf_counter()
            for _ in range(iters):
                m = step(variables, m, batch)
            _ = np.asarray(m.miou_all.inter)
            results[name].append((time.perf_counter() - t0) / iters)

    base = None
    for name in ("xla_argmax", "pallas_argmax"):
        best = min(results[name])
        fps = BATCH / best
        if name == "xla_argmax":
            base = fps
        emit(arm=name, step_ms=round(best * 1e3, 2), fps=round(fps, 1),
             vs_xla_pct=round((fps / base - 1) * 100, 2),
             windows_ms=[round(d * 1e3, 2) for d in results[name]])


if __name__ == "__main__":
    main()
