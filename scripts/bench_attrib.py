#!/usr/bin/env python
"""Per-component time/FLOP attribution of the train & eval steps on the
real chip (VERDICT round-2 item 2: "attribute the missing roofline").

`jax.profiler.start_trace` hangs over the axon transport, so this is a
*component ladder*: each stage of the model (mel, backbone, DeepLab
feature, fusion, head+CE, CoroCL, optimizer) is jitted in isolation at
the batch-32 avss-224 train configuration — forward and
forward+backward — timed with hard host syncs and paired with its own
compiled-HLO FLOP count. The rows sum to within a few percent of the
full step (XLA cross-component fusion is bounded by design here: the
stage boundaries are all materialized tensors in the real step too).

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
BS = 32
HW = 224


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=10, sync=None):
    """Compile, then time. Returns (ms_per_iter, flops_per_iter)."""
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
    from cavp_tpu.engine.loops import make_train_step, preprocess_audio
    from cavp_tpu.engine.optim import make_optimizer
    from cavp_tpu.engine.runner import build_model
    from cavp_tpu.losses import corocl_loss, cross_entropy
    from cavp_tpu.data.synthetic import synthetic_train_batch
    from _bench_util import zero_train_state

    config = get_config("avss").replace(
        image_width=HW, image_height=HW, batch_size=BS,
        compute_dtype="bfloat16")
    model = build_model(config)
    tx, _ = make_optimizer(config)
    state = zero_train_state(model, tx, config, BS)
    params, batch_stats = state.params, state.batch_stats
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(BS, HW, HW, 3).astype(np.float32))
    wave = jnp.asarray(rng.randn(2 * BS, 1, 16000).astype(np.float32) * .1)
    pix = jnp.asarray(rng.randint(0, config.num_classes,
                                  (BS, HW, HW)).astype(np.int32))
    mel = preprocess_audio(wave, n_frames=96)
    h = HW // 4
    fused = jnp.asarray(rng.randn(2 * BS, h, h, 304).astype(np.float32))
    key = jax.random.PRNGKey(0)

    rows = []

    # mel frontend
    ms, fl = timed(lambda w: preprocess_audio(w, n_frames=96), wave)
    rows.append(("mel_frontend_fwd_2B", ms, fl))

    # audio tower fwd / fwd+bwd
    def audio_f(p, a):
        out = model.apply({"params": p, "batch_stats": batch_stats}, a,
                          method=lambda m, x: m.audio_net(x, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(audio_f, params, mel)
    rows.append(("audio_tower_fwd_2B", ms, fl))
    ms, fl = timed(jax.grad(audio_f), params, mel)
    rows.append(("audio_tower_fwd_bwd_2B", ms, fl))

    # visual feature (backbone + ASPP concat) fwd / fwd+bwd (running-avg
    # BN: the batch-stat reductions are a minor delta, attributed to the
    # FULL-step residual)
    def vis_f(p, im):
        out = model.apply({"params": p, "batch_stats": batch_stats}, im,
                          method=lambda m, x: m.forward_visual_feature(x, False))
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(vis_f, params, image)
    rows.append(("visual_feature_fwd_B", ms, fl))
    ms, fl = timed(jax.grad(vis_f), params, image)
    rows.append(("visual_feature_fwd_bwd_B", ms, fl))

    # fusion (projector + sigmoid CA) on the duplicated batch
    fea_a = jnp.asarray(rng.randn(2 * BS, 304).astype(np.float32))
    def fus_f(p, fv, fa):
        out = model.apply({"params": p, "batch_stats": batch_stats}, fv, fa,
                          method=lambda m, v, a: m.forward_fusion(v, a)[0])
        return jnp.sum(out.astype(jnp.float32))
    ms, fl = timed(fus_f, params, fused, fea_a)
    rows.append(("fusion_fwd_2B", ms, fl))
    ms, fl = timed(jax.grad(fus_f, argnums=(0, 1)), params, fused, fea_a)
    rows.append(("fusion_fwd_bwd_2B", ms, fl))

    # classifier head + 224^2 upsample + CE (matched half)
    def head_f(p, fv):
        def inner(m, v):
            logits = m.forward_cls(v[:BS], (HW, HW), False)
            return cross_entropy(logits, pix)
        return model.apply({"params": p, "batch_stats": batch_stats}, fv,
                           method=inner)
    ms, fl = timed(head_f, params, fused)
    rows.append(("head_upsample_ce_fwd_B", ms, fl))
    ms, fl = timed(jax.grad(head_f, argnums=(0, 1)), params, fused)
    rows.append(("head_upsample_ce_fwd_bwd_B", ms, fl))

    # CoroCL on fused features (fwd + bwd wrt embeddings)
    def ctr_f(fv):
        l, _ = corocl_loss(key, fv[:BS], pix, fv[BS:], pix,
                           num_classes=config.num_classes,
                           max_views=config.max_view,
                           class_slots=config.class_slots)
        return l
    ms, fl = timed(ctr_f, fused)
    rows.append(("corocl_fwd", ms, fl))
    ms, fl = timed(jax.grad(ctr_f), fused)
    rows.append(("corocl_fwd_bwd", ms, fl))

    # optimizer update alone (multi-group SGD+Adam + wd) on unit grads
    grads = jax.tree.map(jnp.ones_like, params)
    def opt_f(g, s):
        import optax
        updates, new_opt = tx.update(g, s.opt_state, s.params)
        return optax.apply_updates(s.params, updates), new_opt
    ms, fl = timed(opt_f, grads, state)
    rows.append(("optimizer_update", ms, fl))

    # full train step (the reference: what the rows should sum to)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(config, BS).items()}
    step = make_train_step(model, tx, config, variant="avss")
    ms, fl = timed(step, state, batch, jax.random.PRNGKey(0),
                   jnp.asarray(1), iters=10,
                   sync=lambda out: out[1]["loss/loss"])
    rows.append(("FULL_train_step", ms, fl))

    for name, ms, fl in rows:
        out = dict(component=name, ms=round(ms, 2))
        if fl:
            out["tflop"] = round(fl / 1e12, 3)
            out["achieved_tflops"] = round(fl / (ms / 1e3) / 1e12, 1)
            out["mfu_pct"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK * 100, 1)
        emit(**out)


if __name__ == "__main__":
    main()
