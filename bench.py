#!/usr/bin/env python
"""AVSBench-SS eval throughput benchmark (frames/sec/chip, end-to-end).

The north-star metric (BASELINE.json): full CAVP eval — on-device mel
frontend + ResNet-50/DeepLabV3+ + sigmoid cross-attention + MIoU/FG
metric accumulation (ALL + multi-source subsets) — at the avss-224
configuration.

The reference publishes no throughput numbers (BASELINE.md: published
perf = {}), and its CUDA eval loop cannot run here; ``vs_baseline`` is
therefore measured against a faithful *reference-style* loop on the same
chip: batch-1, frame-at-a-time, with per-frame host metric syncs —
exactly the structure of ``trainer_cavp_avss_image.validation:409-471``
(batch_size=1 loader, per-frame ``.cpu()`` metric reads).

Timing uses explicit host transfers as the sync point (block_until_ready
alone under-reports on the axon transport).

Prints ONE JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((1, 224, 224, 3), jnp.float32)
    audio = jnp.zeros((1, 96, 64, 1), jnp.float32)
    # zero-init via eval_shape: throughput does not depend on param
    # values, and the real init is hundreds of small compiles that
    # dominate wall-clock over the remote-compile transport.
    shapes = jax.eval_shape(lambda r: model.init(r, image, audio,
                                                 eval_mode=True), rng)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    eval_step = jax.jit(make_eval_step(model, config))

    # ---- batched (ours): 12 videos x 10 frames, metrics on device,
    # one host sync per measurement window. B=120 won the round-4 batch
    # sweep (scripts/bench_eval_batch.py: 2803 f/s vs 2707 at B=80,
    # +3.6%; B=160/240 regress — the metric one-hot matmuls' operands
    # outgrow what overlaps with the tower at larger B).
    BATCH = 120
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_eval_batch(config, BATCH).items()}
    metrics = eval_metrics_init(config.num_classes)

    metrics = eval_step(variables, metrics, batch)   # compile
    _ = np.asarray(metrics.miou_all.inter)
    # best of 3 windows: the tunnel's per-sync RTT jitter showed up as a
    # 132-193x spread in the recorded ratio across rounds; a best-of
    # window is the standard fix and measures the same steady state.
    n_iters = 20
    best_dt = float("inf")
    for _window in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            metrics = eval_step(variables, metrics, batch)
        _ = np.asarray(metrics.miou_all.inter)       # hard sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    ours = BATCH * n_iters / best_dt

    # ---- reference-style loop: batch-1 frames, per-frame host sync
    one = {k: v[:1] for k, v in batch.items()}
    m1 = eval_metrics_init(config.num_classes)
    m1 = eval_step(variables, m1, one)               # compile batch-1
    _ = np.asarray(m1.miou_all.inter)
    n_ref = 20
    best_ref = float("inf")
    for _window in range(3):
        t0 = time.perf_counter()
        for _ in range(n_ref):
            m1 = eval_step(variables, m1, one)
            # the reference's per-frame `.cpu()` metric sync
            _ = np.asarray(m1.miou_all.inter)
            _ = np.asarray(m1.fg_all)
        best_ref = min(best_ref, time.perf_counter() - t0)
    ref = n_ref / best_ref

    print(json.dumps({
        "metric": "avsbench_ss_eval_frames_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "frames/sec/chip",
        "batch_size": BATCH,
        "vs_baseline": round(ours / ref, 2),
        # raw emulated-baseline f/s so the run-to-run spread of the
        # ratio (the per-frame sync pays a full tunnel RTT here; 135-193x
        # observed across rounds) is visible per run
        "baseline_fps": round(ref, 2),
    }))


if __name__ == "__main__":
    main()
