#!/usr/bin/env python
"""Second-stage isolation of the ~183 KB/request serving RSS growth:
which allocation class leaks? Arms:

  a. h2d_only      — jnp.asarray of a fresh-strided uint8 image + f32
                     wave each iter, device buffers discarded.
  b. h2d_same      — jnp.asarray of the SAME np arrays each iter
                     (tests whether the put cache keys on identity).
  c. exec_no_h2d   — run the predictor's jitted forward on DEVICE-
                     resident inputs each iter (no per-iter H2D),
                     np.asarray the mask out.
  d. exec_h2d      — the same forward but with per-iter jnp.asarray
                     inputs (the predict composition minus chunking).

Leak in (a) but not (c): the H2D path. Leak in (c): per-execution.
"""

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np
import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run(name, fn):
    samples = []
    for i in range(ITERS):
        fn(i)
        if i % 50 == 49:
            samples.append(rss_mb())
    growth = samples[-1] - samples[len(samples) // 2]
    emit(arm=name, steady_growth_mb=round(growth, 1),
         per_iter_kb=round(growth * 1024 / (ITERS / 2), 1))


def main():
    rng = np.random.RandomState(0)
    img_np = rng.randint(0, 255, (1, 224, 224, 3), dtype=np.uint8)
    wav_np = rng.randn(1, 1, 16000).astype(np.float32)

    def h2d_only(i):
        a = jnp.asarray(img_np + (i % 3))
        b = jnp.asarray(wav_np)
        a.block_until_ready(); b.block_until_ready()

    run("h2d_only", h2d_only)

    def h2d_same(_i):
        a = jnp.asarray(img_np)
        b = jnp.asarray(wav_np)
        a.block_until_ready(); b.block_until_ready()

    run("h2d_same", h2d_same)

    from cavp_tpu.config import get_config
    from cavp_tpu.engine.predictor import Predictor

    config = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    p = Predictor(config, batch_sizes=(1,)).warmup()

    img_dev = jnp.asarray(img_np)
    wav_dev = jnp.asarray(wav_np)
    _ = np.asarray(p._forward(p.variables, img_dev, wav_dev)[0])

    def exec_no_h2d(_i):
        _ = np.asarray(p._forward(p.variables, img_dev, wav_dev)[0])

    run("exec_no_h2d", exec_no_h2d)

    def exec_h2d(_i):
        _ = np.asarray(p._forward(p.variables, jnp.asarray(img_np),
                                  jnp.asarray(wav_np))[0])

    run("exec_h2d", exec_h2d)


if __name__ == "__main__":
    main()
