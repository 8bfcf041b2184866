#!/usr/bin/env python
"""Fine-grained attribution of the visual tower (eval, b80 avss-224).

The round-3 eval ladder left the visual tower as one 13.6 ms row at
~38% MFU — now the dominant eval component. This script splits it:
stem conv1 (the C=3 input conv), stem convs 2-3 + maxpool, layer1..4
(layer4 = the dilation-surgery stage), ASPP + low-level concat. Each
row is jitted in isolation at the real stage-boundary shapes, timed
with hard scalar syncs, paired with compiled-HLO FLOPs. Rows include
the ~3.5 ms/call tunnel dispatch floor (see bench_attrib_eval.py);
interpret deltas, not absolutes.

Output: one JSON line per row.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

V5E_BF16_PEAK = 197e12
BS = 80
HW = 224


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=10):
    compiled = jax.jit(fn).lower(*args).compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
    except Exception:
        pass
    out = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3, flops


def main():
    from flax import linen as nn

    from cavp_tpu.config import get_config
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.models.layers import BatchNorm, Conv, max_pool
    from cavp_tpu.models.resnet import RESNET_LAYERS, Bottleneck, stage_specs

    config = get_config("avss").replace(
        image_width=HW, image_height=HW, compute_dtype="bfloat16")
    model = build_model(config)
    dt = jnp.bfloat16

    rng_np = np.random.RandomState(0)
    image = jnp.asarray(rng_np.randn(BS, HW, HW, 3).astype(np.float32))

    shapes = jax.eval_shape(
        lambda r: model.init(r, image[:1], jnp.zeros((1, 96, 64, 1)),
                             eval_mode=True),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    bb_p = variables["params"]["backbone"]
    bb_s = variables["batch_stats"]["backbone"]

    def sub(tree, names):
        return {n: tree[n] for n in names if n in tree}

    # ---- stem pieces --------------------------------------------------
    def stem_conv1(p, s, x):
        v = {"params": p, "batch_stats": s}

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Conv(64, 3, strides=2, padding=1, use_bias=False,
                         dtype=dt, name="stem_conv1")(x)
                x = BatchNorm(dtype=dt, name="stem_bn1")(x, True)
                return nn.relu(x)
        return jnp.sum(M().apply(v, x).astype(jnp.float32))

    def stem_rest(p, s, x):
        v = {"params": p, "batch_stats": s}

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Conv(64, 3, padding=1, use_bias=False, dtype=dt,
                         name="stem_conv2")(x)
                x = BatchNorm(dtype=dt, name="stem_bn2")(x, True)
                x = nn.relu(x)
                x = Conv(128, 3, padding=1, use_bias=False, dtype=dt,
                         name="stem_conv3")(x)
                x = BatchNorm(dtype=dt, name="bn1")(x, True)
                x = nn.relu(x)
                return max_pool(x, 3, 2, 1)
        return jnp.sum(M().apply(v, x).astype(jnp.float32))

    x0 = image
    x1 = jnp.zeros((BS, 112, 112, 64), dt)    # after stem conv1
    x2 = jnp.zeros((BS, 56, 56, 128), dt)     # after stem+pool
    stage_in = [x2,
                jnp.zeros((BS, 56, 56, 256), dt),
                jnp.zeros((BS, 28, 28, 512), dt),
                jnp.zeros((BS, 14, 14, 1024), dt)]

    rows = []
    ms, fl = timed(stem_conv1, sub(bb_p, ["stem_conv1", "stem_bn1"]),
                   sub(bb_s, ["stem_bn1"]), x0)
    rows.append(("stem_conv1_c3", ms, fl))
    ms, fl = timed(stem_rest,
                   sub(bb_p, ["stem_conv2", "stem_bn2", "stem_conv3", "bn1"]),
                   sub(bb_s, ["stem_bn2", "bn1"]), x1)
    rows.append(("stem_rest_pool", ms, fl))

    # ---- the four stages ----------------------------------------------
    specs = stage_specs(RESNET_LAYERS[50], (False, False, False), True)

    for si, stage in enumerate(specs):
        planes = (64, 128, 256, 512)[si]
        names = [f"layer{si + 1}_{b}" for b in range(len(stage))]

        def stage_f(p, s, x, stage=stage, planes=planes, names=names):
            for spec, nm in zip(stage, names):
                blk = Bottleneck(planes=planes, stride=spec["stride"],
                                 dilation=spec["dilation"],
                                 downsample=spec["downsample"], dtype=dt)
                x = blk.apply({"params": p[nm], "batch_stats": s[nm]},
                              x, False)
            return jnp.sum(x.astype(jnp.float32))
        ms, fl = timed(stage_f, sub(bb_p, names), sub(bb_s, names),
                       stage_in[si])
        rows.append((f"layer{si + 1}", ms, fl))

    # ---- ASPP + low-level concat (segment.forward_feature) -------------
    c1 = jnp.zeros((BS, 56, 56, 256), dt)
    c4 = jnp.zeros((BS, 14, 14, 2048), dt)

    def aspp_f(v, c1, c4):
        out = model.apply(
            v, [c1, None, None, c4],
            method=lambda m, f: m.segment.forward_feature(f, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(aspp_f, variables, c1, c4)
    rows.append(("aspp_concat", ms, fl))

    # ---- whole tower (reference row; should ~sum minus dispatch) -------
    def vis_f(v, im):
        out = model.apply(
            v, im, method=lambda m, x: m.forward_visual_feature(x, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(vis_f, variables, image)
    rows.append(("FULL_visual_feature", ms, fl))

    for name, ms, fl in rows:
        out = dict(component=name, ms=round(ms, 2))
        if fl:
            out["tflop"] = round(fl / 1e12, 3)
            out["mfu_pct"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK * 100, 1)
        emit(**out)


if __name__ == "__main__":
    main()
