#!/usr/bin/env python
"""Serving-daemon latency/throughput on the real chip.

Drives the HTTP server (dynamic batching) with concurrent single-frame
clients — the scenario the batcher exists for — and with sequential
batch-8 requests. Latencies include the npz wire codec and the tunneled
H2D transfer (real v5e hosts stream GB/s; see docs/performance.md)."""

import io
import json
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np
import jax

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def post(url, images, waves):
    buf = io.BytesIO()
    np.savez(buf, images=images, waveforms=waves)
    req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                 method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=120) as r:
        out = np.load(io.BytesIO(r.read()))["mask"]
    return (time.perf_counter() - t0) * 1e3, out


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.engine.predictor import Predictor
    from cavp_tpu.engine.server import make_server

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16")
    predictor = Predictor(config, batch_sizes=(1, 4, 8)).warmup()
    server, batcher = make_server(predictor, port=0, max_wait_ms=8.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    rng = np.random.RandomState(0)
    img1 = rng.randint(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    wav1 = rng.randn(1, 1, config.audio_samples).astype(np.float32)

    # sequential single-frame (no coalescing opportunity)
    post(url, img1, wav1)
    lats = sorted(post(url, img1, wav1)[0] for _ in range(30))
    emit(metric="server_latency_ms", scenario="sequential_b1",
         p50=round(lats[15], 1), p90=round(lats[27], 1))

    # concurrent single-frame clients -> dynamic batching coalesces
    for clients in (4, 8):
        b0 = dict(batcher.stats)
        with ThreadPoolExecutor(clients) as pool:
            t0 = time.perf_counter()
            res = list(pool.map(
                lambda _: post(url, img1, wav1)[0], range(30 * clients)))
            wall = time.perf_counter() - t0
        d_frames = batcher.stats["batch_frames"] - b0["batch_frames"]
        d_batches = batcher.stats["batches"] - b0["batches"]
        res.sort()
        emit(metric="server_latency_ms", scenario=f"concurrent_x{clients}",
             p50=round(res[len(res) // 2], 1),
             p90=round(res[int(len(res) * 0.9)], 1),
             frames_per_s=round(30 * clients / wall, 1),
             mean_coalesced_batch=round(d_frames / max(d_batches, 1), 2))

    # sequential batch-8 requests
    img8 = rng.randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)
    wav8 = rng.randn(8, 1, config.audio_samples).astype(np.float32)
    post(url, img8, wav8)
    lats = sorted(post(url, img8, wav8)[0] for _ in range(20))
    emit(metric="server_latency_ms", scenario="sequential_b8",
         p50=round(lats[10], 1), per_frame_ms=round(lats[10] / 8, 1))

    server.shutdown()
    batcher.close()


if __name__ == "__main__":
    main()
