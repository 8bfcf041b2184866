#!/usr/bin/env python
"""In-context A/B of the round-5 CoroCL blocked exact top-k.

The sampler runs ~(class_slots+2) top-k(512) calls over P = B*h*w
scores; TPU's top-k lowering is an iterative partial sort over the full
row. The blocked form (losses/corocl.py _topk_blocked) pre-selects
per-image top-k then top-ks the B*512 survivors — exactly the global
top-k set in the same order (pinned in tests/test_losses.py). Measured
on the FULL train step (fused kernel on, donated state), interleaved
best-of-3, at both production points. One JSON line per arm per batch.
"""

import functools
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main(batches=(32, 128)):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine import loops
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.losses import corocl_loss

    from _bench_util import zero_train_state

    for bs in batches:
        config = get_config("avss").replace(
            image_width=224, image_height=224, batch_size=bs,
            compute_dtype="bfloat16", use_pallas_fusion_train=True)
        model = build_model(config)
        tx, _ = make_optimizer(config)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_train_batch(config, bs).items()}
        rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

        arms = {}
        losses = {}
        for name, blocked in (("flat_topk", False), ("blocked_topk", True)):
            loops.corocl_loss = functools.partial(
                corocl_loss, _blocked_topk=blocked)
            try:
                step = jax.jit(
                    loops.make_train_step(model, tx, config, variant="avss"),
                    donate_argnums=(0,))
                state = zero_train_state(model, tx, config, bs)
                t0 = time.perf_counter()
                c = step.lower(state, batch, rng, epoch).compile()
                emit(arm=name, batch_size=bs,
                     compile_s=round(time.perf_counter() - t0, 1))
                state, m = c(state, batch, rng, epoch)
                losses[name] = float(m["loss/loss"])
                arms[name] = (c, state)
            finally:
                loops.corocl_loss = corocl_loss

        assert np.isclose(losses["flat_topk"], losses["blocked_topk"],
                          rtol=1e-5), losses
        emit(batch_size=bs, step1_losses=losses)

        iters = 10 if bs <= 64 else 5
        results = {n: [] for n in arms}
        for _w in range(3):
            for name, (c, state) in arms.items():
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, m = c(state, batch, rng, epoch)
                _ = float(m["loss/loss"])
                results[name].append((time.perf_counter() - t0) / iters)
                arms[name] = (c, state)

        base = None
        for name in ("flat_topk", "blocked_topk"):
            best = min(results[name])
            ips = bs / best
            if name == "flat_topk":
                base = ips
            emit(arm=name, batch_size=bs, step_ms=round(best * 1e3, 2),
                 img_per_s=round(ips, 1),
                 vs_flat_pct=round((ips / base - 1) * 100, 2),
                 windows_ms=[round(d * 1e3, 2) for d in results[name]])


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (32, 128))
