#!/usr/bin/env python
"""In-context cost probe for the optimizer update (the last unattacked
train-ladder row: 10.27 ms raw incl. ~4 ms dispatch floor,
docs/performance.md "Refreshed attribution ladders").

Decision question: is a fused/flattened optimizer worth building? The
HBM-traffic floor (read grads+params+momentum, write params+momentum)
is invariant under flattening — the only attackable part is whatever
XLA's per-tensor loop fusions cost beyond that floor, plus the
multi-group (12-group multi_transform) masking machinery. So compare,
on the FULL b32 train step (fused train kernel on, state donated like
production):

  A. the production optimizer (engine/optim.make_optimizer — 7-group
     multi_transform, torch-SGD x6 + Adam, schedule lag);
  B. one plain single-group torch-semantics SGD over the whole tree
     (same per-param traffic: one momentum buffer, wd, lr scale);
  C. the hand-fused single-pass optimizer (engine/optim.py
     fused_optimizer — bitwise A's update, one tree_map; the attack
     the A-B gap motivated).

A - B isolates the multi-group/label machinery + Adam's extra buffer
on the audio tower (measured 1.42 ms/step, 2.3%). A - C is the
recovered machinery; C - B is what's inherent (Adam's extra
buffer/math on the audio leaves). Record the numbers either way.

Prints one JSON line per arm (interleaved best-of-3 windows).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import optax

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def single_group_sgd(lr, momentum, weight_decay):
    """Torch SGD semantics over the whole tree, one group."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-lr),
    )


def main(bs=32):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    from _bench_util import zero_train_state

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=bs,
        compute_dtype="bfloat16", use_pallas_fusion_train=True)
    model = build_model(config)

    tx_prod, _ = make_optimizer(config)
    tx_flat = single_group_sgd(config.lr, config.momentum,
                               config.weight_decay)

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, bs).items()}
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(1)

    tx_fused, _ = make_optimizer(config.replace(fused_optimizer=True))

    arms = {}
    for name, tx in (("prod_multigroup", tx_prod),
                     ("single_group_sgd", tx_flat),
                     ("fused_onepass", tx_fused)):
        state = zero_train_state(model, tx, config, bs)
        step = jax.jit(make_train_step(model, tx, config, variant="avss"),
                       donate_argnums=(0,))
        t0 = time.perf_counter()
        compiled = step.lower(state, batch, rng, epoch).compile()
        emit(arm=name, compile_s=round(time.perf_counter() - t0, 1))
        state, metrics = compiled(state, batch, rng, epoch)
        _ = float(metrics["loss/loss"])
        arms[name] = (compiled, state)

    iters = 10
    results = {n: [] for n in arms}
    for _window in range(3):
        for name, (compiled, state) in arms.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = compiled(state, batch, rng, epoch)
            _ = float(metrics["loss/loss"])
            results[name].append((time.perf_counter() - t0) / iters * 1e3)
            arms[name] = (compiled, state)

    out = {}
    for name, times in results.items():
        best = min(times)
        out[name] = best
        emit(arm=name, step_ms=round(best, 2),
             img_per_s=round(bs / best * 1e3, 1),
             windows_ms=[round(t, 2) for t in times])
    delta = out["prod_multigroup"] - out["single_group_sgd"]
    emit(metric="optimizer_machinery_cost_ms", value=round(delta, 2),
         unit="ms/step",
         pct_of_step=round(delta / out["prod_multigroup"] * 100, 1))
    rec = out["prod_multigroup"] - out["fused_onepass"]
    emit(metric="fused_optimizer_recovered_ms", value=round(rec, 2),
         unit="ms/step",
         pct_of_step=round(rec / out["prod_multigroup"] * 100, 1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
