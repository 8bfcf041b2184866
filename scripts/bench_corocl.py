#!/usr/bin/env python
"""CoroCL fwd+bwd micro-benchmark at train-bench shapes + eval batch
sweep. Tests whether jax.lax.approx_max_k (the TPU-native partial sort)
beats lax.top_k inside the sampler, and where eval throughput peaks."""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    return (time.perf_counter() - t0) / iters


def bench_corocl():
    from cavp_tpu.losses import corocl
    from cavp_tpu.losses.corocl import corocl_loss

    B, h, w, C = 32, 28, 28, 304
    rng = np.random.RandomState(0)
    em = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    es = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 71, (B, 224, 224)), jnp.int32)
    key = jax.random.PRNGKey(0)

    def loss_grad(em, es):
        def f(a, b):
            l, _ = corocl_loss(key, a, gt, b, gt, num_classes=71,
                               max_views=512, class_slots=16)
            return l
        return jax.value_and_grad(f, argnums=(0, 1))(em, es)

    f1 = jax.jit(loss_grad)
    emit(variant="corocl_topk_fwd_bwd_ms",
         value=round(timeit(f1, em, es) * 1e3, 2))

    # swap the sampler's top_k for approx_max_k
    orig = corocl._sample_group

    def approx_sample(key, scores_mask, num_samples):
        p = scores_mask.shape[0]
        scores = jax.random.uniform(key, (p,))
        scores = jnp.where(scores_mask, scores, corocl._NEG_INF)
        top, idx = jax.lax.approx_max_k(scores, num_samples)
        return idx, top > corocl._NEG_INF / 2

    corocl._sample_group = approx_sample
    try:
        f2 = jax.jit(loss_grad)
        emit(variant="corocl_approxk_fwd_bwd_ms",
             value=round(timeit(f2, em, es) * 1e3, 2))
    finally:
        corocl._sample_group = orig


def bench_eval_batches():
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.data.synthetic import synthetic_eval_batch

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16")
    model = build_model(config)
    image = jnp.zeros((1, 224, 224, 3), jnp.float32)
    audio = jnp.zeros((1, 96, 64, 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, image, audio, eval_mode=True),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    eval_step = jax.jit(make_eval_step(model, config))
    for batch_n in (80, 160):
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_eval_batch(config, batch_n).items()}
        metrics = eval_metrics_init(config.num_classes)
        metrics = eval_step(variables, metrics, batch)
        _ = np.asarray(metrics.miou_all.inter)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            metrics = eval_step(variables, metrics, batch)
        _ = np.asarray(metrics.miou_all.inter)
        dt = time.perf_counter() - t0
        emit(variant=f"eval_b{batch_n}",
             frames_per_sec=round(batch_n * iters / dt, 1))


if __name__ == "__main__":
    bench_corocl()
    bench_eval_batches()
