#!/usr/bin/env python
"""Chip throughput for the NON-headline trainer variants.

The README perf table records only the avss-224 configuration; the
other setups — avss_binary (binary masks, J&F-style eval), vpo_mono
and vpo_stereo (ResNet-18 audio tower, 3-s mel, 22 classes) — have
fp64 train-step parity legs and full-model logit-parity tests but no
recorded chip numbers. One jitted train step per variant at its
reference batch semantics (b32, 224², bf16, fused train kernel where
the composition supports it), plus the matching eval forward. One JSON
line per row.
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
BS = 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_one(setup, variant, extra=None):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.loops import make_train_step
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model

    from _bench_util import zero_train_state, zero_variables

    config = get_config(setup).replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16", resize_flag=True,
        use_pallas_fusion_train=True, **(extra or {}))
    model = build_model(config)
    tx, _ = make_optimizer(config)
    state = zero_train_state(model, tx, config, BS)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    rng, epoch = jax.random.PRNGKey(0), jnp.asarray(1)

    step = jax.jit(make_train_step(model, tx, config, variant=variant),
                   donate_argnums=(0,))
    t0 = time.perf_counter()
    c = step.lower(state, batch, rng, epoch).compile()
    compile_s = round(time.perf_counter() - t0, 1)
    flops = None
    try:
        ca = c.cost_analysis()
        flops = (ca[0] if isinstance(ca, list) else ca).get("flops")
    except Exception:
        pass
    state, m = c(state, batch, rng, epoch)
    loss = float(m["loss/loss"])
    assert np.isfinite(loss), (setup, loss)
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            state, m = c(state, batch, rng, epoch)
        _ = float(m["loss/loss"])
        best = min(best, (time.perf_counter() - t0) / 8)
    out = dict(metric="train_img_per_sec_per_chip", setup=setup,
               variant=variant, batch_size=BS,
               value=round(BS / best, 1), step_ms=round(best * 1e3, 2),
               compile_s=compile_s)
    if flops:
        out["mfu_pct"] = round(flops / best / V5E_BF16_PEAK * 100, 1)
    emit(**out)

    # eval forward (same audio-input convention as the variant's tester)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    nch = getattr(config, "in_plane", 1)
    audio = jnp.zeros((BS, config.mel_frames, 64, nch), jnp.float32)
    fwd = jax.jit(lambda v, i, a: jnp.sum(
        model.apply(v, i, a, eval_mode=True)[0].astype(jnp.float32)))
    image = jnp.zeros((BS, 224, 224, 3), jnp.float32)
    _ = float(fwd(variables, image, audio))
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            o = fwd(variables, image, audio)
        _ = float(o)
        best = min(best, (time.perf_counter() - t0) / 10)
    emit(metric="eval_fwd_frames_per_sec_per_chip", setup=setup,
         variant=variant, batch_size=BS, value=round(BS / best, 1),
         step_ms=round(best * 1e3, 2))


def main():
    bench_one("avss_binary", "avss")
    bench_one("vpo_ss", "vpo_mono")
    # main_vpo_stereo.py: CAVP(..., in_plane=2)
    bench_one("vpo_ss", "vpo_stereo", extra={"in_plane": 2})


if __name__ == "__main__":
    main()
