#!/usr/bin/env python
"""Decompose the --use_baseline train step's anomalous slowness
(bench_ablate: 154ms/7.7% MFU for a strict subset of the full CAVP
step's work). Times: VisualModel fwd, fwd+CE, full bwd step, and the
same with the CE replaced by a mean — isolating whether the CE at
[32,224,224,71] or the backward is the pathology."""

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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / 10


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.losses import cross_entropy

    config = get_config("avss").replace(
        image_width=224, image_height=224, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config, baseline=True)
    image = jnp.zeros((1, 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, image, None, eval_mode=True),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    img, pix = batch["image"], batch["pix_label"]

    # 1) eval-mode forward
    fwd = jax.jit(lambda v, x: model.apply(v, x, None, True)[0])
    emit(variant="vis_fwd_eval",
         ms=round(timeit(fwd, variables, img,
                         sync=lambda o: float(o.sum())) * 1e3, 1))

    # 2) train-mode forward (BN batch stats)
    fwd_t = jax.jit(lambda v, x: model.apply(
        v, x, None, False, mutable=["batch_stats"])[0][0])
    emit(variant="vis_fwd_train",
         ms=round(timeit(fwd_t, variables, img,
                         sync=lambda o: float(o.sum())) * 1e3, 1))

    # 3) grad of mean(logits) — backward without CE
    def loss_mean(params):
        (logits, _, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, None, False, mutable=["batch_stats"])
        return jnp.mean(logits.astype(jnp.float32))

    g1 = jax.jit(jax.grad(loss_mean))
    emit(variant="vis_bwd_mean",
         ms=round(timeit(g1, variables["params"],
                         sync=lambda o: float(
                             jax.tree_util.tree_leaves(o)[0].sum())) * 1e3, 1))

    # 4) grad of CE — the full baseline objective
    def loss_ce(params):
        (logits, _, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, None, False, mutable=["batch_stats"])
        return cross_entropy(logits, pix)

    g2 = jax.jit(jax.grad(loss_ce))
    emit(variant="vis_bwd_ce",
         ms=round(timeit(g2, variables["params"],
                         sync=lambda o: float(
                             jax.tree_util.tree_leaves(o)[0].sum())) * 1e3, 1))

    # 5) CE alone at [32,224,224,71]
    logits = jnp.zeros((BS, 224, 224, 71), jnp.bfloat16)
    ce = jax.jit(jax.value_and_grad(lambda l: cross_entropy(l, pix)))
    emit(variant="ce_alone_fwd_bwd",
         ms=round(timeit(ce, logits,
                         sync=lambda o: float(o[0])) * 1e3, 1))


if __name__ == "__main__":
    main()
