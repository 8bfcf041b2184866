"""Torch-parity image interpolation on NHWC tensors.

The reference mixes three interpolation conventions that all matter for
numeric parity (SURVEY.md §7 "Interp semantics"):

- bilinear ``align_corners=False`` for logit upsampling
  (``cavp_model.py:140``) — half-pixel source coordinates;
- bilinear ``align_corners=True`` inside the DeepLab feature path
  (``encoder_decoder.py:103``) — endpoint-aligned coordinates;
- ``nearest`` for label downsampling (``loss/contrastive_aud.py:18-22``)
  — torch's asymmetric floor(dst*scale) rule (NOT half-pixel rounding,
  which is what jax.image.resize implements).

Each is implemented as separable gathers with precomputed static
index/weight vectors, which XLA fuses well on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_coords(in_size: int, out_size: int, align_corners: bool):
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


@functools.lru_cache(maxsize=None)
def _nearest_coords(in_size: int, out_size: int):
    # torch F.interpolate(mode="nearest"): src = floor(dst * in/out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.minimum(idx, in_size - 1)


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense [out, in] interpolation matrix (two nonzeros per row).

    Expressing the separable resize as matmuls keeps it on the MXU —
    substantially faster on TPU than the gather+lerp formulation for the
    logit/feature upsampling sizes used here (56->224, 14->56, ...)."""
    lo, hi, w = _linear_coords(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def _interp_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_interp_matrix(in_size, out_size, align_corners), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, m.T)
    return jnp.moveaxis(out, -1, axis)


def interpolate_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """[..., H, W, C] -> [..., size[0], size[1], C], torch bilinear parity."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    x = _interp_axis(x, h_axis, size[0], align_corners)
    x = _interp_axis(x, w_axis, size[1], align_corners)
    return x


def interpolate_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """[..., H, W] -> resized on the LAST TWO axes, torch nearest parity.

    There is no channel-aware path: pass labels/maps with H, W trailing
    (an NHWC tensor here would silently resize W and C).
    """
    h_axis, w_axis = x.ndim - 2, x.ndim - 1
    rows = jnp.asarray(_nearest_coords(x.shape[h_axis], size[0]))
    cols = jnp.asarray(_nearest_coords(x.shape[w_axis], size[1]))
    x = jnp.take(x, rows, axis=h_axis)
    x = jnp.take(x, cols, axis=w_axis)
    return x
