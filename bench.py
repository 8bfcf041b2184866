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

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def main():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from _bench_util import (eval_bench_setup, headline_eval_config,
                             timed_eval_fps)
    from cavp_tpu.engine.loops import eval_metrics_init

    config = headline_eval_config()
    # ---- batched (ours): 12 videos x 10 frames, metrics on device,
    # one host sync per measurement window. B=120 won the round-4 batch
    # sweep (scripts/bench_eval_batch.py: 2803 f/s vs 2707 at B=80,
    # +3.6%; B=160/240 regress — the metric one-hot matmuls' operands
    # outgrow what overlaps with the tower at larger B).
    # Zero-init via eval_shape inside the scaffold: throughput does not
    # depend on param values, and the real init is hundreds of small
    # compiles that dominate wall-clock over the remote transport.
    BATCH = 120
    model, variables, eval_step, batch, metrics = eval_bench_setup(
        config, BATCH)
    # best of 3 windows: the tunnel's per-sync RTT jitter showed up as a
    # 132-193x spread in the recorded ratio across rounds; a best-of
    # window is the standard fix and measures the same steady state.
    ours = timed_eval_fps(eval_step, variables, batch, metrics, BATCH,
                          n_iters=20)

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
