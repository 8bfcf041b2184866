"""Fused ResNet layer1 Pallas kernel (eval path).

Layer1 is the visual tower's bandwidth-bound row (chip ladder,
docs/performance.md "Visual-tower per-stage ladder": ~8 ms real at 5%
MFU for b80 eval): three bottleneck blocks at 56 square whose thin
64-channel matmuls are dwarfed by the BN/ReLU/residual HBM round-trips
over 128 MB of activations. Reference blocks:
``models/visual/backbones/resnet.py:53-98`` (Bottleneck), stage built
at ``resnet.py:140-152`` — rebuilt as flax in
``cavp_tpu/models/resnet.py``.

This kernel runs the WHOLE stage — every bottleneck block, each
``1x1 -> BN/ReLU -> 3x3 -> BN/ReLU -> 1x1 -> BN (+downsample) -> ReLU``
— for one image in a single VMEM-resident pass: the stem output is
read from HBM once, the c1 feature written once. The intermediate
activations (~9 HBM round-trips per block in the module path, even
after XLA's conv+BN+ReLU fusion) never leave VMEM.

Mechanics:
- grid = (B,): one program per image; a [H+2, W+2, C] zero-halo
  scratch carries the running feature between blocks so each 3x3 conv
  reads its padding as true zeros (the halo is re-masked after every
  bias/shift-producing op).
- the 3x3 conv is 9 shifted [H*W, 64] x [64, 64] matmuls accumulated
  in f32 (exactly conv as matmul; static slices, MXU-friendly M).
- eval BatchNorm is applied as the folded per-channel affine
  ``y = acc * (gamma/sqrt(var+eps)) + (beta - mean*gamma/sqrt(var+eps))``
  on the f32 accumulator — same math as
  ``cavp_tpu.models.layers.BatchNorm`` at eval, applied pre-rounding
  (the module path rounds the conv output to bf16 first; tolerance, not
  bitwise, equivalence — pinned in tests/test_layer1_kernel.py).

Eval-only: no custom VJP; BN batch-stat mutation keeps the train path
on the flax composition (same contract as fusion_kernel.py).

MEASURED RESULT (chip, b120): isolated the kernel wins big — 5.85 ms
vs 8.32 ms module (-30%) — but the full eval step is 5.7% SLOWER with
it (2670 vs 2833 f/s, reproduced): in context XLA already fuses the
stage's elementwise chains into the adjacent convs and overlaps its
HBM traffic, so the attackable cost is far below the isolated row.
Kept opt-in (``--use_pallas_layer1``) as a recorded negative — see
docs/performance.md "Fused layer1 residual-stage kernel".
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

# VMEM budget gate. The unrolled 3-block chain's Mosaic stack measured
# ~17 MB at 56x56 under the declared 20 MB ``vmem_limit_bytes`` (see the
# compiler_params note below); the stack scales ~linearly with pixels,
# so anything above the measured 56x56 map would fail Mosaic's scoped-
# memory check at compile time instead of running. Gate at exactly the
# measured shape; larger maps (320/384/512-sq images) fall back to the
# module path (row-tiling with chained halos would be needed — not
# worth it until a ladder names it).
_MAX_HW = 56 * 56


def layer1_fits(h: int, w: int) -> bool:
    return h * w <= _MAX_HW


def _affine_relu(acc, s_ref, t_ref, dt):
    """Folded eval-BN + ReLU on the f32 accumulator, rounded to dt."""
    return jnp.maximum(acc * s_ref[0] + t_ref[0], 0.0).astype(dt)


def _make_kernel(n_blocks: int, hp: int, wp: int, cin: int, planes: int,
                 cout: int):
    hi, wi = hp - 2, wp - 2
    ni = hi * wi

    def kernel(*args):
        x_ref = args[0]
        refs = args[1:-3]
        out_ref, x_scr, y_scr = args[-3], args[-2], args[-1]
        dt = x_ref.dtype

        # interior mask (the halo must read as conv zero-padding)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 1)
        mask = ((rows >= 1) & (rows < hp - 1) & (cols >= 1)
                & (cols < wp - 1)).astype(dt)

        # pad in VMEM (a host-side jnp.pad would round-trip the stem
        # output through HBM a second time)
        x_scr[...] = jnp.zeros((hp, wp, cin), dt)
        x_scr[1:hp - 1, 1:wp - 1, :] = x_ref[0]
        y_scr[...] = jnp.zeros((hp, wp, cout), dt)
        x = x_scr[...]                                 # [hp, wp, cin]
        r = 0
        for b in range(n_blocks):
            w1, s1, t1, w2, s2, t2, w3, s3, t3 = refs[r:r + 9]
            r += 9
            if b == 0:
                wd, sd, td = refs[r:r + 3]
                r += 3
                inp, c_in = x, cin
            else:
                inp, c_in = y_scr[...], cout

            flat = inp.reshape(hp * wp, c_in)
            h1 = _affine_relu(
                jnp.dot(flat, w1[...], preferred_element_type=_F32),
                s1, t1, dt)
            h1 = (h1.reshape(hp, wp, planes) * mask)   # zero halo again

            acc = jnp.zeros((ni, planes), _F32)
            for k in range(9):
                dy, dx = k // 3, k % 3
                sl = h1[dy:dy + hi, dx:dx + wi, :].reshape(ni, planes)
                acc = acc + jnp.dot(sl, w2[k], preferred_element_type=_F32)
            h2 = _affine_relu(acc, s2, t2, dt)

            # residual first, rounded to dt immediately (module order:
            # both BN outputs are dt before the add) — also halves the
            # peak f32 VMEM footprint vs combining in f32
            if b == 0:
                xi = x[1:hp - 1, 1:wp - 1, :].reshape(ni, cin)
                res = jnp.dot(xi, wd[...], preferred_element_type=_F32)
                res = (res * sd[0] + td[0]).astype(dt)
            else:
                res = inp[1:hp - 1, 1:wp - 1, :].reshape(ni, cout)
            o = jnp.dot(h2, w3[...], preferred_element_type=_F32)
            o = (o * s3[0] + t3[0]).astype(dt)          # BN3, no relu yet
            y = jnp.maximum(o + res, 0.0)
            y_scr[1:hp - 1, 1:wp - 1, :] = y.reshape(hi, wi, cout)

        out_ref[0] = y_scr[1:hp - 1, 1:wp - 1, :]

    return kernel


def _fold_bn(bn_params, bn_stats, eps: float):
    """gamma/sqrt(var+eps), beta - mean*that — f32 [1, C] rows."""
    g = bn_params["scale"].astype(_F32)
    b = bn_params["bias"].astype(_F32)
    m = bn_stats["mean"].astype(_F32)
    v = bn_stats["var"].astype(_F32)
    s = g * jax.lax.rsqrt(v + eps)
    return s.reshape(1, -1), (b - m * s).reshape(1, -1)


def fused_layer1(bkb_params: Dict[str, Any], bkb_stats: Dict[str, Any], x,
                 *, eps: float = 1e-5, interpret: bool = False):
    """Run the full layer1 stage as one Pallas kernel.

    bkb_params/bkb_stats: the backbone's ``params`` / ``batch_stats``
    subtrees (need ``layer1_<i>``). x: [B, H, W, Cin] stem output.
    Returns c1 [B, H, W, 4*planes] — equal (up to bf16 rounding) to
    chaining the flax Bottleneck blocks at eval.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    names = []
    i = 0
    while f"layer1_{i}" in bkb_params:
        names.append(f"layer1_{i}")
        i += 1
    if not names:
        raise ValueError("no layer1_<i> blocks in params")

    B, H, W, cin = x.shape
    if not layer1_fits(H, W):
        raise ValueError(f"layer1 map {H}x{W} exceeds the VMEM tile gate")
    dt = x.dtype
    p0 = bkb_params[names[0]]
    planes = p0["conv1"]["kernel"].shape[-1]
    cout = p0["conv3"]["kernel"].shape[-1]
    assert "downsample_conv" in p0, "layer1 block0 must have a downsample"

    operands, specs = [], []

    def add(a, spec_shape):
        operands.append(a)
        specs.append(pl.BlockSpec(spec_shape, lambda b: (0,) * len(spec_shape),
                                  memory_space=pltpu.VMEM))

    for b, name in enumerate(names):
        p, st = bkb_params[name], bkb_stats[name]
        c_in = cin if b == 0 else cout
        assert p["conv2"]["kernel"].shape[:2] == (3, 3)
        add(p["conv1"]["kernel"].astype(dt).reshape(c_in, planes),
            (c_in, planes))
        s1, t1 = _fold_bn(p["bn1"], st["bn1"], eps)
        add(s1, (1, planes)); add(t1, (1, planes))
        add(p["conv2"]["kernel"].astype(dt).reshape(9, planes, planes),
            (9, planes, planes))
        s2, t2 = _fold_bn(p["bn2"], st["bn2"], eps)
        add(s2, (1, planes)); add(t2, (1, planes))
        add(p["conv3"]["kernel"].astype(dt).reshape(planes, cout),
            (planes, cout))
        s3, t3 = _fold_bn(p["bn3"], st["bn3"], eps)
        add(s3, (1, cout)); add(t3, (1, cout))
        if b == 0:
            add(p["downsample_conv"]["kernel"].astype(dt).reshape(cin, cout),
                (cin, cout))
            sd, td = _fold_bn(p["downsample_bn"], st["downsample_bn"], eps)
            add(sd, (1, cout)); add(td, (1, cout))

    hp, wp = H + 2, W + 2
    kernel = _make_kernel(len(names), hp, wp, cin, planes, cout)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((1, H, W, cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dt),
        scratch_shapes=[pltpu.VMEM((hp, wp, cin), dt),
                        pltpu.VMEM((hp, wp, cout), dt)],
        # the unrolled 3-block chain peaks ~17 MB of Mosaic stack at
        # 56-sq (the allocator does not reuse across the unroll); v5e
        # has headroom beyond the 16 MB default scoped limit. Keep the
        # declared limit tight — XLA budgets prefetch around the call
        # by this number.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024),
        interpret=interpret,
    )(x, *operands)
    return out
