"""Phase-decomposed input-gradient for stride-2 3x3 convs.

The input-gradient of a stride-2 conv is a transposed conv: the [Ho,Wo]
cotangent is lhs-dilated (zero-stuffed) to [H,W] — 3/4 zeros — before
the 3x3 window reduction, so a naive lowering wastes ~4x MXU MACs (and
reads the zero-stuffed buffer from HBM). The tower's stride-2 3x3 convs
(deep-stem conv1, layer2/3 first-block conv2 — reference surgery in
``models/visual/deeplabv3/resnet.py``; rebuilt in models/resnet.py)
pay this on every training step.

This module rewrites the input-gradient *exactly* by output phase: for
``gx[i, j]`` the valid kernel taps are fixed by ``(i % 2, j % 2)``
(``i = 2p + ti - 1`` forces ``ti``'s parity), so the transposed conv
splits into four dense stride-1 convs over the *undilated* cotangent —
phase (0,0): the 1x1 center tap; (0,1)/(1,0): 1x2 / 2x1 two-tap convs;
(1,1): a 2x2 four-tap conv — interleaved back with reshapes (no
scatter). Total MACs = the conv's useful count (9/4 per input pixel vs
9 through the zero-stuffed form). The weight-gradient is left on XLA's
default lowering (x windows contracted with the small cotangent — no
zero-stuffing there).

Whether XLA:TPU already performs this rewrite internally is measured by
``scripts/bench_stride2_bwd.py`` (probe) and ``scripts/bench_s2_ab.py``
(in-context train-step A/B); the gate ships opt-in (``--s2_phase_bwd``)
until the chip numbers justify a default flip.

Exactness: every output pixel of gx belongs to exactly one phase, and
each phase conv accumulates its (<= 4) taps in f32 exactly as the
transposed conv would — the only difference is dropping products that
are identically zero. Pinned vs the default VJP in tests/test_stride2.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Opt-in: flipped by --s2_phase_bwd (engine/runner.py), pending the
# chip A/B. Trace-time gate, same convention as ops/dilated.ENABLED.
ENABLED = False


def _plain_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_conv(cot: jax.Array, kern: jax.Array, pad) -> jax.Array:
    return jax.lax.conv_general_dilated(
        cot, kern, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def phase_grad_input(cot: jax.Array, w: jax.Array) -> jax.Array:
    """Input-gradient of a stride-2/padding-1 3x3 NHWC conv, computed as
    four dense phase convs over the undilated cotangent.

    cot: [B, Ho, Wo, Co]; w: [3, 3, Ci, Co] (HWIO). Returns
    [B, 2*Ho, 2*Wo, Ci] in cot.dtype. Requires the forward input to
    have had even H and W (then Ho == H // 2 under this padding).
    """
    B, Ho, Wo, _ = cot.shape
    Ci = w.shape[2]
    wT = jnp.swapaxes(w, 2, 3)  # [3, 3, Co, Ci]

    # Kernels indexed by the cotangent offset delta (ascending), where
    # gx_phase[r, s] = sum_delta cot[r + dh, s + dw] @ wT[tap(delta)]:
    # even output index -> center tap (delta 0); odd -> taps ti=2
    # (delta 0) and ti=0 (delta 1). High-side padding 1 zeroes the
    # out-of-range cot read at the last odd row/column.
    k00 = wT[1:2, 1:2]
    k01 = jnp.stack([wT[1, 2], wT[1, 0]], axis=0)[None]
    k10 = jnp.stack([wT[2, 1], wT[0, 1]], axis=0)[:, None]
    k11 = jnp.stack([jnp.stack([wT[2, 2], wT[2, 0]], axis=0),
                     jnp.stack([wT[0, 2], wT[0, 0]], axis=0)], axis=0)

    g00 = _phase_conv(cot, k00, ((0, 0), (0, 0)))
    g01 = _phase_conv(cot, k01, ((0, 0), (0, 1)))
    g10 = _phase_conv(cot, k10, ((0, 1), (0, 0)))
    g11 = _phase_conv(cot, k11, ((0, 1), (0, 1)))

    even = jnp.stack([g00, g01], axis=3).reshape(B, Ho, 2 * Wo, Ci)
    odd = jnp.stack([g10, g11], axis=3).reshape(B, Ho, 2 * Wo, Ci)
    return jnp.stack([even, odd], axis=2).reshape(B, 2 * Ho, 2 * Wo, Ci)


@jax.custom_vjp
def conv3x3_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    """``conv_general_dilated(x, w, strides=2, padding=1)`` (NHWC/HWIO
    3x3) with the phase-decomposed input-gradient. Forward is the plain
    conv; only the VJP differs."""
    return _plain_s2(x, w)


def _fwd(x, w):
    return _plain_s2(x, w), (x, w)


def _bwd(res, cot):
    x, w = res
    gx = phase_grad_input(cot, w).astype(x.dtype)
    # Weight-gradient: XLA's default lowering (no zero-stuffed operand).
    gw = jax.vjp(lambda ww: _plain_s2(x, ww), w)[1](cot)[0]
    return gx, gw


conv3x3_s2.defvjp(_fwd, _bwd)


def _plain_1x1_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv1x1_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    """``conv_general_dilated(x, w, strides=2, padding=0)`` (NHWC/HWIO
    1x1 — the ResNet downsample projections) with the input-gradient
    computed as one dense matmul + interior zero-padding instead of a
    transposed conv over the zero-stuffed cotangent (4x MAC waste)."""
    return _plain_1x1_s2(x, w)


def _fwd1(x, w):
    return _plain_1x1_s2(x, w), (x, w)


def _bwd1(res, cot):
    x, w = res
    g = jax.lax.dot_general(cot, w[0, 0], (((3,), (1,)), ((), ())))
    # interior zero-stuffing of the *result* (cheap pad, no MACs):
    # gx[2r, 2s] = cot[r, s] @ w^T, zero elsewhere
    gx = jax.lax.pad(g, jnp.zeros((), g.dtype),
                     ((0, 0, 0), (0, 1, 1), (0, 1, 1), (0, 0, 0)))
    gw = jax.vjp(lambda ww: _plain_1x1_s2(x, ww), w)[1](cot)[0]
    return gx.astype(x.dtype), gw


conv1x1_s2.defvjp(_fwd1, _bwd1)


def applicable(ks, st, pd, dl, groups: int, h: int, w: int) -> bool:
    """Trace-time gate used by models/layers.Conv (3x3 path)."""
    return (ENABLED and ks == (3, 3) and st == (2, 2) and pd == (1, 1)
            and dl == (1, 1) and groups == 1
            and h % 2 == 0 and w % 2 == 0)


def applicable_1x1(ks, st, pd, dl, groups: int, h: int, w: int) -> bool:
    """Trace-time gate used by models/layers.Conv (1x1 downsample path)."""
    return (ENABLED and ks == (1, 1) and st == (2, 2) and pd == (0, 0)
            and dl == (1, 1) and groups == 1
            and h % 2 == 0 and w % 2 == 0)
