#!/usr/bin/env python
"""Stub-ablation: what does CoroCL's InfoNCE (the [N,N] similarity
chain, N = (class_slots+2)*max_views = 9216) cost inside the full train
step, post gather-before-normalize? Decides whether a flash-style
streaming InfoNCE Pallas kernel is worth building.

Arms: production vs InfoNCE stubbed to a same-signature O(N*C) reduction
(keeps sampling, gathers, normalization, and the loss's gradient path
through the anchors alive — only the N^2 similarity work is removed).
Interleaved best-of-3 full steps. One JSON line per arm per batch.
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main(batches=(32, 128)):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine import loops
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.losses import corocl as corocl_mod

    from _bench_util import zero_train_state

    real_nce = corocl_mod._masked_info_nce

    def stub_nce(anchors, labels, valid, temperature):
        # O(N*C): keeps anchors (and their grads) live, drops the N^2 work
        vf = valid.astype(jnp.float32)
        return jnp.sum(jnp.sum(anchors, axis=-1) * vf) / (
            jnp.maximum(jnp.sum(vf), 1.0) * temperature)

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
        for name, nce in (("production", real_nce), ("infonce_stub",
                                                     stub_nce)):
            corocl_mod._masked_info_nce = nce
            try:
                step = jax.jit(
                    loops.make_train_step(model, tx, config, variant="avss"),
                    donate_argnums=(0,))
                state = zero_train_state(model, tx, config, bs)
                c = step.lower(state, batch, rng, epoch).compile()
                state, m = c(state, batch, rng, epoch)
                _ = float(m["loss/loss"])
                arms[name] = (c, state)
            finally:
                corocl_mod._masked_info_nce = real_nce

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

        prod = min(results["production"])
        stub = min(results["infonce_stub"])
        emit(batch_size=bs, production_ms=round(prod * 1e3, 2),
             stub_ms=round(stub * 1e3, 2),
             infonce_cost_ms=round((prod - stub) * 1e3, 2),
             pct_of_step=round((prod - stub) / prod * 100, 2))


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (32, 128))
