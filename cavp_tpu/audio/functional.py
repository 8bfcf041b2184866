"""Scalar audio transforms.

Rebuilds ``utils/sourcesep.py:27-60`` (dB/amp conversion and [-1, 1]
spectrogram normalization) as pure jnp functions.
"""

from __future__ import annotations

import jax.numpy as jnp

_LN10 = 2.302585092994046  # ln(10)


def log10(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x) / _LN10


def db_from_amp(x: jnp.ndarray, floor: float = 1e-5) -> jnp.ndarray:
    """20*log10(max(floor, x)) — reference ``sourcesep.db_from_amp:27``.

    Note the reference feeds this the *power* mel spectrogram (torchaudio
    MelSpectrogram defaults to power=2.0), so the result is 20*log10(P).
    """
    return 20.0 * log10(jnp.maximum(jnp.asarray(floor, x.dtype), x))


def amp_from_db(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x / 20.0)


def norm_range(x: jnp.ndarray, min_val: float, max_val: float) -> jnp.ndarray:
    return 2.0 * (x - min_val) / float(max_val - min_val) - 1.0


def unnorm_range(y: jnp.ndarray, min_val: float, max_val: float) -> jnp.ndarray:
    return 0.5 * float(max_val - min_val) * (y + 1.0) + min_val


def normalize_spec(spec: jnp.ndarray, spec_min: float, spec_max: float) -> jnp.ndarray:
    """Reference ``sourcesep.normalize_spec:46`` (spec_min/max = ±100)."""
    return norm_range(spec, spec_min, spec_max)


def unnormalize_spec(spec: jnp.ndarray, spec_min: float, spec_max: float) -> jnp.ndarray:
    return unnorm_range(spec, spec_min, spec_max)


def normalize_phase(phase: jnp.ndarray) -> jnp.ndarray:
    import numpy as _np

    return norm_range(phase, -_np.pi, _np.pi)


def unnormalize_phase(phase: jnp.ndarray) -> jnp.ndarray:
    import numpy as _np

    return unnorm_range(phase, -_np.pi, _np.pi)


def normalize_ims(im: jnp.ndarray) -> jnp.ndarray:
    """sourcesep.normalize_ims:62-67 — [0,1] image to [-1,1]."""
    return -1.0 + 2.0 * im.astype(jnp.float32)


def mix_sounds(waves, axis: int = 0) -> jnp.ndarray:
    """sourcesep legacy mix: sum sources (device-side variant of
    data.audio_io.mix_sources)."""
    return jnp.sum(jnp.stack(waves, axis=axis), axis=axis)
