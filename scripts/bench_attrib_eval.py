#!/usr/bin/env python
"""Per-component time/FLOP attribution of the EVAL step on the real chip.

Round-2 VERDICT weak #1: eval saturates at ~2080 f/s (34.5% MFU) but the
missing ~2/3 of the roofline was never attributed op-by-op. Same method
as scripts/bench_attrib.py (the profiler cannot run over the axon
transport): each stage of the batch-80 avss-224 eval step is jitted in
isolation, timed with hard host syncs, and paired with its compiled-HLO
FLOP count. Stage boundaries are materialized tensors in the real step,
so rows sum to within a few percent of the full step.

The metric block gets its own sub-ladder (argmax / miou_update /
fg_update / multi-source flag) because the eval step runs FOUR metric
updates over the [80,224,224,71] logits and each re-derives argmax and
one-hot histograms — a suspected bandwidth sink.

Output: one JSON line per row -> docs/performance.md table.
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
import sys as _sys
BS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 80
HW = 224


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=10, sync=None):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
    except Exception:
        pass
    out = compiled(*args)
    _sync(out if sync is None else sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _sync(out if sync is None else sync(out))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, flops


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf)


def main():
    from cavp_tpu.config import get_config
    from cavp_tpu.data.synthetic import synthetic_eval_batch
    from cavp_tpu.engine.loops import (_multi_source_flag, eval_metrics_init,
                                       make_eval_step, preprocess_audio)
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.metrics import fg_update, miou_update

    config = get_config("avss").replace(
        image_width=HW, image_height=HW, compute_dtype="bfloat16")
    model = build_model(config)

    rng_np = np.random.RandomState(0)
    image = jnp.asarray(rng_np.randn(BS, HW, HW, 3).astype(np.float32))
    wave = jnp.asarray(rng_np.randn(BS, 1, 16000).astype(np.float32) * .1)
    pix = jnp.asarray(rng_np.randint(0, config.num_classes,
                                     (BS, HW, HW)).astype(np.int32))
    valid = jnp.ones((BS,), jnp.float32)
    mel = preprocess_audio(wave, n_frames=config.mel_frames)
    h = HW // 4
    fea_v = jnp.asarray(
        rng_np.randn(BS, h, h, 304).astype(np.float32)).astype(jnp.bfloat16)
    fea_a = jnp.asarray(
        rng_np.randn(BS, 304).astype(np.float32)).astype(jnp.bfloat16)
    fused = fea_v

    # zero variables via eval_shape (real init is hundreds of remote compiles)
    shapes = jax.eval_shape(
        lambda r: model.init(r, image[:1], mel[:1], eval_mode=True),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rows = []

    # mel frontend
    ms, fl = timed(lambda w: jnp.sum(preprocess_audio(
        w, n_frames=config.mel_frames).astype(jnp.float32)), wave)
    rows.append(("mel_frontend", ms, fl))

    # audio tower
    def audio_f(p, a):
        out = model.apply({"params": p, "batch_stats": batch_stats}, a,
                          method=lambda m, x: m.audio_net(x, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(audio_f, params, mel)
    rows.append(("audio_tower", ms, fl))

    # visual tower + ASPP feature
    def vis_f(p, im):
        out = model.apply({"params": p, "batch_stats": batch_stats}, im,
                          method=lambda m, x: m.forward_visual_feature(x, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(vis_f, params, image)
    rows.append(("visual_feature", ms, fl))

    # fusion (projector + sigmoid CA), dup=1
    def fus_f(p, fv, fa):
        out = model.apply({"params": p, "batch_stats": batch_stats}, fv, fa,
                          method=lambda m, v, a: m.forward_fusion(v, a)[0])
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(fus_f, params, fea_v, fea_a)
    rows.append(("fusion", ms, fl))

    # fusion via the fused Pallas kernel (round 3)
    from cavp_tpu.ops.pallas.fusion_kernel import fused_visual_fusion

    def fus_pallas_f(p, fv, fa):
        return jnp.sum(fused_visual_fusion(p, fv, fa).astype(jnp.float32))
    ms, fl = timed(fus_pallas_f, params, fea_v, fea_a)
    rows.append(("fusion_pallas", ms, fl))

    # classifier head + 224^2 bilinear upsample
    def head_f(p, fv):
        return model.apply({"params": p, "batch_stats": batch_stats}, fv,
                           method=lambda m, v: m.forward_cls(v, (HW, HW), False))
    ms, fl = timed(lambda p, fv: jnp.sum(head_f(p, fv).astype(jnp.float32)),
                   params, fused)
    rows.append(("head_upsample", ms, fl))
    logits = head_f(params, fused)
    logits = jnp.asarray(rng_np.randn(*logits.shape).astype(np.float32)
                         ).astype(logits.dtype)
    emit(component="logits_dtype", note=str(logits.dtype),
         bytes_mb=round(logits.size * logits.dtype.itemsize / 1e6, 1))

    # ---- metric block sub-ladder over real-shaped logits
    ms, fl = timed(lambda l: jnp.sum(jnp.argmax(l, axis=-1)), logits)
    rows.append(("argmax_only", ms, fl))

    m0 = eval_metrics_init(config.num_classes)
    ms, fl = timed(lambda l: miou_update(m0.miou_all, l, pix, weight=valid),
                   logits)
    rows.append(("miou_update_x1", ms, fl))
    ms, fl = timed(lambda l: fg_update(m0.fg_all, l, pix, weight=valid),
                   logits)
    rows.append(("fg_update_x1", ms, fl))
    ms, fl = timed(lambda t: jnp.sum(jax.vmap(_multi_source_flag)(t)), pix)
    rows.append(("multi_source_flag", ms, fl))

    def metric_block(l, t):
        msf = jax.vmap(_multi_source_flag)(t).astype(jnp.float32) * valid
        from cavp_tpu.engine.loops import EvalMetrics
        return EvalMetrics(
            miou_all=miou_update(m0.miou_all, l, t, weight=valid),
            miou_ms=miou_update(m0.miou_ms, l, t, weight=msf),
            fg_all=fg_update(m0.fg_all, l, t, weight=valid),
            fg_ms=fg_update(m0.fg_ms, l, t, weight=msf),
        )
    ms, fl = timed(metric_block, logits, pix,
                   sync=lambda out: out.miou_all.inter)
    rows.append(("metric_block_4x_single", ms, fl))

    from cavp_tpu.metrics import fg_update_weighted, miou_update_weighted

    def metric_block_shared(l, t):
        msf = jax.vmap(_multi_source_flag)(t).astype(jnp.float32) * valid
        pred = jnp.argmax(l, axis=-1).astype(jnp.int32)
        ma, mm = miou_update_weighted((m0.miou_all, m0.miou_ms), pred, t,
                                      (valid, msf))
        fa, fm = fg_update_weighted((m0.fg_all, m0.fg_ms), pred, t,
                                    (valid, msf))
        from cavp_tpu.engine.loops import EvalMetrics
        return EvalMetrics(miou_all=ma, miou_ms=mm, fg_all=fa, fg_ms=fm)
    ms, fl = timed(metric_block_shared, logits, pix,
                   sync=lambda out: out.miou_all.inter)
    rows.append(("metric_block_shared", ms, fl))

    def miou_pair_only(l, t):
        pred = jnp.argmax(l, axis=-1).astype(jnp.int32)
        return miou_update_weighted((m0.miou_all, m0.miou_ms), pred, t,
                                    (valid, valid))
    ms, fl = timed(miou_pair_only, logits, pix,
                   sync=lambda out: out[0].inter)
    rows.append(("miou_pair_incl_argmax", ms, fl))

    def fg_pair_only(pred, t):
        return fg_update_weighted((m0.fg_all, m0.fg_ms), pred, t,
                                  (valid, valid))
    pred_arr = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ms, fl = timed(fg_pair_only, pred_arr, pix,
                   sync=lambda out: out[0])
    rows.append(("fg_pair_from_pred", ms, fl))

    # ---- full eval step (what the rows should sum to)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_eval_batch(config, BS).items()}
    eval_step = make_eval_step(model, config)
    metrics = eval_metrics_init(config.num_classes)
    ms, fl = timed(lambda v, m, b: eval_step(v, m, b),
                   variables, metrics, batch,
                   iters=20, sync=lambda out: out.miou_all.inter)
    rows.append(("FULL_eval_step", ms, fl))

    eval_step_pl = make_eval_step(
        model, config.replace(use_pallas_fusion=True))
    ms, fl = timed(lambda v, m, b: eval_step_pl(v, m, b),
                   variables, metrics, batch,
                   iters=20, sync=lambda out: out.miou_all.inter)
    rows.append(("FULL_eval_step_pallas", ms, fl))

    for name, ms, fl in rows:
        out = dict(component=name, ms=round(ms, 2))
        if fl:
            out["tflop"] = round(fl / 1e12, 3)
            out["achieved_tflops"] = round(fl / (ms / 1e3) / 1e12, 1)
            out["mfu_pct"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK * 100, 1)
        emit(**out)


if __name__ == "__main__":
    main()
