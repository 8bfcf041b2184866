#!/usr/bin/env python
"""SP at its design point (VERDICT r3 item 6): does ≥1024² inference
run spatially sharded, and when does SP actually pay on hardware?

Two modes:

  --cpu-mesh : a real ≥1024² H-sharded forward on the 8-virtual-device
               CPU mesh (thin ResNet-18 tower — the full 50-tower at
               1024² on one serialized core trips XLA:CPU's 40 s
               collective rendezvous timeout, CLAUDE.md gotcha).
               Proves the partitioned program (conv halos + per-token
               fusion) compiles AND executes at the resolution SP was
               built for, not just at the 128² test shape.

  (default)  : single-chip datapoints on the real TPU — flagship
               ResNet-50 CAVP eval forward at 512/1024/2048², B=1,
               latency (hard host sync) + compiled peak-memory
               estimate via jitted .memory_analysis(). Answers "does
               1024² even need SP on one v5e?" with numbers for
               docs/distributed.md.

Prints one JSON line per datapoint.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def cpu_mesh_main():
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from cavp_tpu.utils.hostfp import set_compile_cache

    set_compile_cache("/tmp/jax_test_cache", 1.0)

    from cavp_tpu.models.cavp import CAVP
    from cavp_tpu.parallel import create_mesh
    from cavp_tpu.parallel.spatial import make_spatial_infer

    H = W = 1024
    model = CAVP(num_classes=7, visual_backbone=18)
    rng = np.random.RandomState(0)
    # init at a small shape (shape-polymorphic flax params), run at 1024²
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 128, 3), jnp.float32),
        jnp.zeros((1, 96, 64, 1), jnp.float32), True)
    image = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32) * 0.1)
    audio = jnp.asarray(rng.randn(1, 96, 64, 1).astype(np.float32) * 0.1)

    mesh = create_mesh(num_devices=8)
    infer = make_spatial_infer(model, mesh, variables=variables)
    t0 = time.perf_counter()
    logits = infer(image, audio)
    val = float(jnp.sum(jnp.abs(logits)))  # hard sync
    dt = time.perf_counter() - t0
    assert np.isfinite(val), "non-finite logits from the sharded forward"
    emit(what="sp_cpu_mesh_forward", hw=H, devices=8,
         backbone=18, logits_shape=list(logits.shape),
         sharded_over=len(logits.sharding.device_set),
         finite=True, compile_plus_run_s=round(dt, 1))


def chip_main():
    import jax
    import jax.numpy as jnp

    from cavp_tpu.utils.hostfp import set_compile_cache

    set_compile_cache("/tmp/jax_tpu_cache")

    from cavp_tpu.config import get_config
    from cavp_tpu.engine.runner import build_model

    for hw in (512, 1024, 2048):
        cfg = get_config("avss").replace(
            image_width=hw, image_height=hw, compute_dtype="bfloat16")
        model = build_model(cfg)
        # zero variables from eval_shape (init on the tunneled chip is
        # hundreds of small compiles)
        shapes = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, hw, hw, 3), jnp.float32),
                                 jnp.zeros((1, cfg.mel_frames, 64, 1),
                                           jnp.float32), True),
            jax.random.PRNGKey(0))
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        rng = np.random.RandomState(0)
        image = jnp.asarray(rng.randn(1, hw, hw, 3).astype(np.float32) * 0.1)
        audio = jnp.asarray(rng.randn(1, cfg.mel_frames, 64, 1)
                            .astype(np.float32) * 0.1)

        def fwd(v, i, a):
            logits, _, _ = model.apply(v, i, a, eval_mode=True)
            return jnp.sum(jnp.argmax(logits, -1).astype(jnp.int32))

        try:
            lowered = jax.jit(fwd).lower(variables, image, audio)
            compiled = lowered.compile()
            mem = compiled.memory_analysis()
            peak = getattr(mem, "temp_size_in_bytes", None)
            args_b = getattr(mem, "argument_size_in_bytes", None)
            s = int(compiled(variables, image, audio))  # warm + sync
            iters = 10 if hw <= 1024 else 4
            t0 = time.perf_counter()
            for _ in range(iters):
                s = compiled(variables, image, audio)
            _ = int(s)  # hard host sync
            ms = (time.perf_counter() - t0) / iters * 1e3
            emit(what="single_chip_eval_fwd", hw=hw, batch=1,
                 latency_ms=round(ms, 2),
                 temp_bytes=int(peak) if peak else None,
                 arg_bytes=int(args_b) if args_b else None,
                 fits=True)
        except Exception as exc:  # OOM at some resolution IS the datapoint
            emit(what="single_chip_eval_fwd", hw=hw, batch=1, fits=False,
                 error=str(exc)[:300])


if __name__ == "__main__":
    if "--cpu-mesh" in sys.argv:
        cpu_mesh_main()
    else:
        chip_main()
