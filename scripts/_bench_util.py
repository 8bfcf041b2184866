"""Shared helpers for the bench scripts.

Zero-built variables via jax.eval_shape (throughput does not depend on
parameter values; real `model.init` on the tunneled TPU is hundreds of
small compiles — CLAUDE.md) and the TrainState assembly all train
benches need.
"""

import jax
import jax.numpy as jnp


def zero_variables(model, image_hw=(224, 224), audio_shape=(1, 96, 64, 1)):
    image = jnp.zeros((1,) + tuple(image_hw) + (3,), jnp.float32)
    audio = jnp.zeros(audio_shape, jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, image, audio, eval_mode=True),
        jax.random.PRNGKey(0))
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def headline_eval_config(**overrides):
    """The bench.py headline configuration (avss-224, bf16, Pallas
    fusion kernel), with optional flag overrides for A/B arms."""
    from cavp_tpu.config import get_config

    cfg = get_config("avss").replace(
        image_width=224, image_height=224, compute_dtype="bfloat16",
        use_pallas_fusion=True)
    return cfg.replace(**overrides) if overrides else cfg


def eval_bench_setup(config, batch_size, ones_batch_stats=False):
    """Shared eval-bench scaffold: model, zero variables, jitted eval
    step, device-resident synthetic batch, fresh metrics.

    ``ones_batch_stats`` replaces the zero BN running vars with 1.0 —
    needed when an arm folds BN (a zero running var yields a huge folded
    scale; harmless for timing but unrealistic magnitudes).
    """
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
    from cavp_tpu.engine.runner import build_model

    model = build_model(config)
    variables = zero_variables(
        model, (config.image_height, config.image_width))
    if ones_batch_stats and "batch_stats" in variables:
        variables = {
            "params": variables["params"],
            "batch_stats": jax.tree_util.tree_map(
                jnp.ones_like, variables["batch_stats"]),
        }
    eval_step = jax.jit(make_eval_step(model, config))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_eval_batch(config, batch_size).items()}
    metrics = eval_metrics_init(config.num_classes)
    return model, variables, eval_step, batch, metrics


def timed_eval_fps(eval_step, variables, batch, metrics, batch_size,
                   n_iters=None, n_windows=3):
    """Compile + warm with a hard host sync, then best-of-``n_windows``
    pipelined windows (one sync per window — block_until_ready alone
    under-reports on the axon transport). Returns frames/sec."""
    import time

    import numpy as np

    if n_iters is None:
        n_iters = max(4, 1600 // batch_size)
    metrics = eval_step(variables, metrics, batch)   # compile + warm
    _ = np.asarray(metrics.miou_all.inter)
    best_dt = float("inf")
    for _window in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            metrics = eval_step(variables, metrics, batch)
        _ = np.asarray(metrics.miou_all.inter)       # hard sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    return batch_size * n_iters / best_dt


def zero_train_state(model, tx, config, batch_size):
    from cavp_tpu.engine.state import TrainState
    from cavp_tpu.models.soundbank import init_bank

    variables = zero_variables(
        model, (config.image_height, config.image_width),
        # derive the init-mel shape from the config so non-avss setups
        # (3-s mel -> 300 frames, VPO stereo -> 2 channels) init the
        # audio tower with the right channel count
        audio_shape=(1, getattr(config, "mel_frames", 96), 64,
                     getattr(config, "in_plane", 1)))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        sound_bank=init_bank(config.num_classes, batch_size,
                             config.audio_samples))
