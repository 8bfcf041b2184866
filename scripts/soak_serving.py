#!/usr/bin/env python
"""Serving soak: sustained Predictor load with host-RSS + latency-drift
tracking (the production-stability evidence the latency percentiles
alone don't give). N batch-1 predicts through the full uint8->mask path
on the real chip; RSS sampled every 100 requests.

ENVIRONMENT CAVEAT (measured, scripts/diag_soak_leak{,2}.py): on the
tunneled axon transport every HOST->DEVICE transfer leaks ~166 KB/call
host-side in the PJRT client (the staged input bytes are never freed);
device->host and execution are clean (~1 KB/iter). That is transport-
side, not serving-path Python — gc.collect() does not reclaim it and
device-resident-input execution shows none of it. The soak therefore
measures an H2D-only control loop first and gates on the RESIDUAL
growth (predict minus control, per iteration), plus latency drift
(late-half p50 vs early-half > LAT_DRIFT_MAX fails).

Prints one JSON line per sample window and a final gate line; exit 1 on
gate failure.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
RESIDUAL_KB_MAX = 48.0     # per-request growth beyond the H2D control
LAT_DRIFT_MAX = 0.15       # late-half p50 vs early-half p50


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def h2d_control(config, iters):
    """Per-iteration host-RSS cost of the bare input H2D pair on this
    transport (the environment baseline the gate subtracts)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    wav = rng.randn(1, 1, config.audio_samples).astype(np.float32)
    samples = []
    for i in range(iters):
        a = jnp.asarray(img)
        b = jnp.asarray(wav)
        a.block_until_ready(); b.block_until_ready()
        if i % 50 == 49:
            samples.append(rss_mb())
    growth = samples[-1] - samples[len(samples) // 2]
    return growth * 1024 / (iters / 2)


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.predictor import Predictor

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    ctrl_kb = h2d_control(config, min(400, N))
    print(json.dumps({"event": "h2d_control",
                      "per_iter_kb": round(ctrl_kb, 1)}), flush=True)
    t0 = time.perf_counter()
    p = Predictor(config, batch_sizes=(1,)).warmup()
    print(json.dumps({"event": "warm", "s": round(time.perf_counter() - t0,
                                                  1),
                      "rss_mb": round(rss_mb(), 1)}), flush=True)

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (1, 224, 224, 3), dtype=np.uint8)
            for _ in range(8)]
    wavs = [rng.randn(1, 1, config.audio_samples).astype(np.float32)
            for _ in range(8)]

    lats = []
    rss = []
    for i in range(N):
        t0 = time.perf_counter()
        out = p.predict(imgs[i % 8], wavs[i % 8])
        lats.append((time.perf_counter() - t0) * 1e3)
        if i % 100 == 99:
            rss.append(rss_mb())
            print(json.dumps({
                "event": "sample", "n": i + 1,
                "rss_mb": round(rss[-1], 1),
                "p50_last100_ms": round(sorted(lats[-100:])[50], 1)}),
                flush=True)
    assert out["mask"].shape == (1, 224, 224), out["mask"].shape

    half = len(rss) // 2
    rss_growth = rss[-1] - rss[half]
    n_steady = (len(rss) - half) * 100
    per_iter_kb = rss_growth * 1024 / n_steady
    residual_kb = per_iter_kb - ctrl_kb
    early = sorted(lats[200:200 + (N - 200) // 2])
    late = sorted(lats[200 + (N - 200) // 2:])
    p50_early = early[len(early) // 2]
    p50_late = late[len(late) // 2]
    drift = p50_late / p50_early - 1
    ok = residual_kb < RESIDUAL_KB_MAX and drift < LAT_DRIFT_MAX
    print(json.dumps({
        "event": "gate", "n": N,
        "rss_growth_steady_mb": round(rss_growth, 1),
        "per_iter_kb": round(per_iter_kb, 1),
        "h2d_control_kb": round(ctrl_kb, 1),
        "residual_kb_per_req": round(residual_kb, 1),
        "p50_early_ms": round(p50_early, 1),
        "p50_late_ms": round(p50_late, 1),
        "latency_drift_pct": round(drift * 100, 1),
        "ok": bool(ok)}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
