#!/usr/bin/env python
"""512² batch sweep under the round-4 fused kernels.

The original 512² rows (scripts/bench_512.py) were measured at b8 only.
The fused train kernel removed the fusion stage's AD stashes (the GELU
input alone is ~640 MB at 512²/b8), and the b128 result at 224² showed
the post-kernel optimum moves to larger batches — so the 512² batch
question is re-asked for both paths:

  - eval forward (Pallas fusion kernel on) at b8/16/24/32
  - train step (fused train kernel on, donated state) at b8/12/16

One JSON line per point; OOM points are recorded as such.
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

V5E_BF16_PEAK = 197e12


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _bench_util import zero_train_state, zero_variables
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_inference_forward, make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    base = get_config("avss").replace(
        image_width=512, image_height=512, compute_dtype="bfloat16")
    model = build_model(base)
    variables = zero_variables(model, (512, 512))

    # ---- eval forward, Pallas fusion kernel
    infer = make_inference_forward(model,
                                   base.replace(use_pallas_fusion=True))
    for bs in (8, 16, 24, 32):
        try:
            image = jnp.zeros((bs, 512, 512, 3), jnp.float32)
            audio = jnp.zeros((bs, 96, 64, 1), jnp.float32)
            fwd = jax.jit(lambda v, i, a: jnp.sum(infer(v, i, a)
                                                  .astype(jnp.float32)))
            _ = float(fwd(variables, image, audio))
            best = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    o = fwd(variables, image, audio)
                _ = float(o)
                best = min(best, (time.perf_counter() - t0) / 10)
            emit(metric="avss512_eval_fwd_fps", variant="pallas_fusion",
                 batch_size=bs, value=round(bs / best, 1),
                 step_ms=round(best * 1e3, 1))
        except Exception as e:
            emit(metric="avss512_eval_fwd_fps", batch_size=bs,
                 error=str(e)[:200])

    # ---- train step, fused train kernel, donated state
    for bs in (8, 12, 16):
        try:
            config = base.replace(batch_size=bs,
                                  use_pallas_fusion_train=True)
            tx, _ = make_optimizer(config)
            state = zero_train_state(model, tx, config, bs)
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_train_batch(config, bs).items()}
            rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)
            step = jax.jit(make_train_step(model, tx, config,
                                           variant="avss"),
                           donate_argnums=(0,))
            c = step.lower(state, batch, rng, epoch).compile()
            flops = None
            try:
                ca = c.cost_analysis()
                flops = (ca[0] if isinstance(ca, list) else ca).get("flops")
            except Exception:
                pass
            state, m = c(state, batch, rng, epoch)
            _ = float(m["loss/loss"])
            best = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    state, m = c(state, batch, rng, epoch)
                _ = float(m["loss/loss"])
                best = min(best, (time.perf_counter() - t0) / 8)
            out = dict(metric="avss512_train_img_s", variant="fused_kernel",
                       batch_size=bs, value=round(bs / best, 1),
                       step_ms=round(best * 1e3, 1))
            if flops:
                out["mfu_pct"] = round(flops / best / V5E_BF16_PEAK * 100, 1)
            emit(**out)
        except Exception as e:
            emit(metric="avss512_train_img_s", batch_size=bs,
                 error=str(e)[:200])


if __name__ == "__main__":
    main()
