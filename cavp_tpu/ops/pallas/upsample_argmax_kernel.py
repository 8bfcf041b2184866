"""Fused bilinear-upsample + argmax Pallas kernel (eval path).

The eval step upsamples class logits to input resolution
(``cavp_model.py:138-141``: bilinear align_corners=False) and immediately
argmaxes them for the MIoU/FG metrics — the full-resolution logits
tensor ([80, 224, 224, 71] ≈ 570 MB bf16 at the bench configuration)
exists only to be reduced over its channel axis. This kernel computes
the separable interpolation per row-block in VMEM and writes only the
int32 argmax — the logits never touch HBM.

Exactness: the interpolation uses the same `_interp_matrix` weights as
:mod:`cavp_tpu.ops.interp` in the same H-then-W order; each matrix row
has at most two nonzeros, and adding exact zeros is exact in floating
point, so the blocked matmuls produce bitwise-identical values to the
module path (f32 accumulation, rounded to the IO dtype — the same
contract XLA gives bf16 matmuls). The argmax (first-max tie rule, as
jnp.argmax) is therefore bitwise-equal too, which the tests pin.

Mosaic constraints shape the implementation: reshapes may only merge or
split a 128-aligned minor dim, so channels are padded to a lane
multiple *outside* the kernel (with a huge negative fill that can never
win the argmax — not -inf, since interp-matrix zeros would turn it into
NaN); dot_general is 2D, so the W-interp+argmax runs as a small
unrolled loop over the row block; argmax lowers for f32 only (bf16 ->
f32 is exact, so comparing upcast values preserves tie behavior).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavp_tpu.ops.interp import _interp_matrix

_F32 = jnp.float32
_PAD_FILL = -1e30  # below any real logit; finite so 0 * fill == 0


def _make_kernel(row_block: int):
    def _kernel(x_ref, rw_ref, cw_ref, out_ref):
        h = x_ref.shape[1]
        w, c = cw_ref.shape[1], x_ref.shape[3]
        wout = cw_ref.shape[0]
        src2 = x_ref[0].reshape(h, w * c)       # c is lane-aligned
        dt = src2.dtype
        # H interp for the whole row block: [rb, h] @ [h, w*c]
        tmp = jnp.dot(rw_ref[:], src2,
                      preferred_element_type=_F32).astype(dt)
        # W interp as ONE matmul: move w major, fold (rb, c) into lanes
        tmpt = tmp.reshape(row_block, w, c).transpose(1, 0, 2)
        tmpt = tmpt.reshape(w, row_block * c)
        col = jnp.dot(cw_ref[:], tmpt,
                      preferred_element_type=_F32).astype(dt)
        colf = col.reshape(wout, row_block, c).astype(_F32)
        # argmax with the first-max tie rule, spelled as max + index-min
        # (Mosaic's argmax lowering rejects these shapes). All in f32 —
        # int32 lane reductions lower ~6x slower; class indices are
        # exact in f32.
        mx = jnp.max(colf, axis=-1, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, colf.shape, 2).astype(_F32)
        hit = jnp.where(colf == mx, idx, float(c))
        out_ref[0] = jnp.min(hit, axis=-1).transpose(1, 0)  # [rb, W] f32
    return _kernel


def upsample_argmax(logits, out_hw: Tuple[int, int], *,
                    align_corners: bool = False,
                    row_block: Optional[int] = None,
                    interpret: bool = False):
    """argmax(interpolate_bilinear(logits, out_hw), -1) without
    materializing the upsampled logits. logits: [B, h, w, C] NHWC.
    Returns int32 [B, out_h, out_w]."""
    B, h, w, c = logits.shape
    H, W = out_hw
    dt = logits.dtype
    interpret = interpret or jax.default_backend() == "cpu"

    lane = 128
    cpad = -(-c // lane) * lane
    if cpad != c:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, cpad - c)),
                         constant_values=jnp.asarray(_PAD_FILL, dt))

    rw = jnp.asarray(_interp_matrix(h, H, align_corners), dt)   # [H, h]
    cw = jnp.asarray(_interp_matrix(w, W, align_corners), dt)   # [W, w]

    if row_block is None:
        # 32 measured best at 224^2 (16 doubles the per-step overhead;
        # 56 pressures VMEM with the f32 col intermediate)
        row_block = 32
        while H % row_block:
            row_block //= 2
    assert H % row_block == 0, (H, row_block)

    out = pl.pallas_call(
        _make_kernel(row_block),
        grid=(B, H // row_block),
        in_specs=[
            pl.BlockSpec((1, h, w, cpad), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, h), lambda b, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block, W), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), _F32),
        interpret=interpret,
    )(logits, rw, cw)
    # f32 -> int32 outside the kernel (values are exact small ints)
    return out.astype(jnp.int32)
