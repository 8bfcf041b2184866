#!/usr/bin/env python
"""Full train step (batch 32) with lax.top_k vs lax.approx_max_k inside
CoroCL's sampler — the in-step number is the one that matters (the
micro-bench is dominated by grad D2H over the tunnel)."""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

BS = 32


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine import loops
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.losses import corocl

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    from _bench_util import zero_train_state

    state = zero_train_state(model, tx, config, BS)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

    def measure(tag):
        step = jax.jit(loops.make_train_step(model, tx, config,
                                             variant="avss"))
        c = step.lower(state, batch, rng, epoch).compile()
        s, m = c(state, batch, rng, epoch)
        _ = float(m["loss/loss"])
        t0 = time.perf_counter()
        s2 = state
        for _ in range(10):
            s2, m = c(s2, batch, rng, epoch)
        _ = float(m["loss/loss"])
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"variant": tag, "step_ms": round(dt * 1e3, 1),
                          "img_per_s": round(BS / dt, 1)}), flush=True)

    measure("topk")

    orig = corocl._sample_group

    def approx_sample(key, scores_mask, num_samples):
        p = scores_mask.shape[0]
        scores = jax.random.uniform(key, (p,))
        scores = jnp.where(scores_mask, scores, corocl._NEG_INF)
        top, idx = jax.lax.approx_max_k(scores, num_samples)
        return idx, top > corocl._NEG_INF / 2

    corocl._sample_group = approx_sample
    try:
        measure("approx_max_k")
    finally:
        corocl._sample_group = orig


if __name__ == "__main__":
    main()
