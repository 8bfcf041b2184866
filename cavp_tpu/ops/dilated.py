"""Exact tap-matmul decomposition for heavily-dilated 3x3 convs.

The avss towers run their dilated 3x3 convs at small spatial maps
(output stride 16: 14x14 at 224 input) with dilations that are a large
fraction of — or exceed — the map size: layer4's conv2 at dilation
2/4/8 (``models/visual/deeplabv3/encoder_decoder.py:40-55`` surgery)
and the ASPP branches at rate 6/12/18 (``encoder_decoder.py:137-156``).
With ``padding == dilation`` the off-center taps mostly multiply zero
padding; at rate 18 on a 14x14 map the +-18 offsets are *entirely* out
of bounds — the conv is mathematically a 1x1. ``conv_general_dilated``
still pays all 9 taps through the MXU.

This module rewrites such a conv exactly as

    out[p, q] = sum_{ti, tj} x[p + (ti-1)d, q + (tj-1)d] @ w[ti, tj]

with the center tap as one full-map matmul and each partially-valid
off-center tap as a matmul over only its valid slice (fully-invalid
taps dropped), accumulated in f32. Useful-FLOP fraction at H=W=14:
d=2 0.82, d=4 0.66, d=6 0.51, d=8 0.38, d=12 0.18, d=18 0.11.

Exactness: removed terms are exactly zero (0 * w summed in the conv);
the remaining difference is summation order, pinned at f32/f64
tolerance in tests/test_dilated.py and by the fp64 train-parity
harness (the decomposition is on by default in the model path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Escape hatch for debugging / A-B benching: ops.dilated.ENABLED = False
# restores plain conv_general_dilated everywhere.
ENABLED = True

# Decompose only when the sliced taps save enough FLOPs to beat one
# fused conv: measured on v5e (scripts/bench_dilated_conv.py), the
# crossover sits near a useful-FLOP fraction of ~0.85.
FRACTION_THRESHOLD = 0.85


def useful_fraction(h: int, w: int, dh: int, dw: int) -> float:
    """Fraction of the 9-tap FLOPs that touch in-bounds input."""
    vh = h + 2 * max(0, h - dh)
    vw = w + 2 * max(0, w - dw)
    return (vh * vw) / float(9 * h * w)


def should_decompose(h: int, w: int, dilation: Tuple[int, int]) -> bool:
    dh, dw = dilation
    if dh <= 1 and dw <= 1:
        return False
    return useful_fraction(h, w, dh, dw) < FRACTION_THRESHOLD


def _matmul_f32(inp: jax.Array, tap: jax.Array, acc) -> jax.Array:
    return jax.lax.dot_general(
        inp, tap, (((3,), (0,)), ((), ())), preferred_element_type=acc)


def _add_edge_taps(out, x: jax.Array, w: jax.Array,
                   dilation: Tuple[int, int], acc) -> jax.Array:
    """Adds the 8 off-center taps of a padding==dilation 3x3 conv to an
    existing center-tap output (``out`` in the ``acc`` dtype)."""
    B, H, W, Ci = x.shape
    dh, dw = dilation
    for ti in range(3):
        for tj in range(3):
            if ti == 1 and tj == 1:
                continue
            oi, oj = (ti - 1) * dh, (tj - 1) * dw
            p0, p1 = max(0, -oi), min(H, H - oi)
            q0, q1 = max(0, -oj), min(W, W - oj)
            if p0 >= p1 or q0 >= q1:
                continue  # tap reads only padding
            xs = jax.lax.slice(
                x, (0, p0 + oi, q0 + oj, 0), (B, p1 + oi, q1 + oj, Ci))
            contrib = _matmul_f32(xs, w[ti, tj], acc)
            out = out + jnp.pad(
                contrib, ((0, 0), (p0, H - p1), (q0, W - q1), (0, 0)))
    return out


def conv3x3_dilated_taps(x: jax.Array, w: jax.Array,
                         dilation: Tuple[int, int]) -> jax.Array:
    """Exact rewrite of ``conv_general_dilated(x, w, strides=1,
    padding=dilation, rhs_dilation=dilation)`` for a 3x3 kernel.

    x: [B, H, W, Cin] (NHWC), w: [3, 3, Cin, Cout]. Accumulates the
    tap sum in f32 (matching the conv's f32 MXU accumulation) and
    returns x.dtype.
    """
    acc = jnp.promote_types(x.dtype, jnp.float32)
    out = _matmul_f32(x, w[1, 1], acc)
    out = _add_edge_taps(out, x, w, dilation, acc)
    return out.astype(x.dtype)


def aspp_branches(x: jax.Array, w1x1: jax.Array, w3x3s, rates) -> jax.Array:
    """The four ASPP branch convs (1x1 + three dilated 3x3s over the
    SAME input) with all four *center* taps merged into one matmul.

    Separately each branch re-reads the [B,H,W,2048] map and runs a
    256-wide matmul; merged, the center is a single [Ci, 4h] MXU pass
    (one read of x, 1024-wide output) and only the small sliced edge
    taps remain per dilated branch. Exact: same taps, f32 accumulation.
    Returns the channel-concat [B,H,W,4h] in x.dtype (matching
    ``jnp.concatenate([branch0..3], -1)``).
    """
    acc = jnp.promote_types(x.dtype, jnp.float32)
    h = w1x1.shape[-1]
    centers = jnp.concatenate([w1x1[0, 0]] + [w[1, 1] for w in w3x3s],
                              axis=-1)
    out = _matmul_f32(x, centers, acc)
    parts = [out[..., i * h:(i + 1) * h] for i in range(4)]
    for i, (w, r) in enumerate(zip(w3x3s, rates)):
        parts[i + 1] = _add_edge_taps(parts[i + 1], x, w, (r, r), acc)
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)
