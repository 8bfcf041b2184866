#!/usr/bin/env python
"""Settle the Pallas-vs-XLA mel question: interleaved repeated
measurements in one process (the per-process numbers flip-flop run to
run on the tunneled chip), reporting medians."""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")


def main():
    from cavp_tpu.audio.mel import preprocess_audio

    N = 512
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(N, 1, 16000).astype(np.float32))
    fns = {
        "xla": jax.jit(lambda w: preprocess_audio(w, n_frames=96,
                                                  use_pallas=False)),
        "pallas": jax.jit(lambda w: preprocess_audio(w, n_frames=96,
                                                     use_pallas=True)),
    }
    for f in fns.values():
        _ = np.asarray(f(wave))  # compile
    samples = {k: [] for k in fns}
    for _ in range(7):
        for k, f in fns.items():
            out = f(wave)
            _ = np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(30):
                out = f(wave)
            _ = np.asarray(out)
            samples[k].append((time.perf_counter() - t0) / 30 / N * 1e6)
    for k, v in samples.items():
        print(json.dumps({"variant": k,
                          "median_us_per_clip": round(float(np.median(v)), 2),
                          "min": round(min(v), 2), "max": round(max(v), 2)}),
              flush=True)


if __name__ == "__main__":
    main()
