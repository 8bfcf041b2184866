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


def zero_train_state(model, tx, config, batch_size):
    from cavp_tpu.engine.state import TrainState
    from cavp_tpu.models.soundbank import init_bank

    variables = zero_variables(
        model, (config.image_height, config.image_width))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        sound_bank=init_bank(config.num_classes, batch_size,
                             config.audio_samples))
