#!/usr/bin/env python
"""Token-block sweep for the TRAIN fusion Pallas kernel at the b128
production point. `_pick_block` caps blocks at 256 (-> 224 for N=3136);
this asks whether a different block wins for the fwd+recompute-bwd
pair. Exact for any block (zero-cotangent pad rows are grad-inert).
Full train steps, interleaved best-of-3; VMEM-overflow arms recorded as
errors. One JSON line per arm.
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

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CAPS = tuple(int(a) for a in sys.argv[2:]) or (112, 224, 448)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine import loops
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.ops.pallas import fusion_train_kernel as ftk

    from _bench_util import zero_train_state

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16", use_pallas_fusion_train=True)
    model = build_model(config)
    tx, _ = make_optimizer(config)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

    real_pick = ftk._pick_block
    arms = {}
    losses = {}
    for cap in CAPS:
        ftk._pick_block = (lambda n, dt, cap=cap, _r=real_pick:
                           _r(n, dt, cap=cap))
        try:
            step = jax.jit(
                loops.make_train_step(model, tx, config, variant="avss"),
                donate_argnums=(0,))
            state = zero_train_state(model, tx, config, BS)
            c = step.lower(state, batch, rng, epoch).compile()
            state, m = c(state, batch, rng, epoch)
            losses[cap] = float(m["loss/loss"])
            arms[cap] = (c, state)
        except Exception as e:
            emit(arm=f"cap_{cap}", error=str(e)[:200])
        finally:
            ftk._pick_block = real_pick

    if not losses:
        emit(error="no arm compiled"); return
    if len({round(v, 5) for v in losses.values()}) > 1:
        emit(warning="losses differ across blocks", losses=losses)
    elif len(losses) > 1:
        emit(step1_losses_equal=True, loss=next(iter(losses.values())))
    else:
        emit(single_surviving_arm=True, losses=losses)

    iters = 5
    results = {c: [] for c in arms}
    for _w in range(3):
        for cap, (c, state) in arms.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = c(state, batch, rng, epoch)
            _ = float(m["loss/loss"])
            results[cap].append((time.perf_counter() - t0) / iters)
            arms[cap] = (c, state)

    base = None
    if 224 in results:
        base = BS / min(results[224])
    for cap in CAPS:
        if cap not in results:
            continue
        best = min(results[cap])
        ips = BS / best
        emit(arm=f"cap_{cap}", step_ms=round(best * 1e3, 2),
             img_per_s=round(ips, 1),
             vs_224_pct=round((ips / base - 1) * 100, 2) if base else None,
             windows_ms=[round(d * 1e3, 2) for d in results[cap]])


if __name__ == "__main__":
    main()
