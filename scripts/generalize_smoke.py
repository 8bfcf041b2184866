#!/usr/bin/env python
"""Objective-effect proof beyond memorization (VERDICT r3 item 2).

Two chip runs on an *audio-decisive* synthetic AVSS fixture — classes
2k-1/2k share one visual tint while the audio tone stays per-class, the
object square sits at a per-video random position, and the validation
split is HELD OUT (different videos, backgrounds, positions than
training):

  A) defaults          — CoroCL on  (corocl_w=1, reference weighting)
  B) --corocl_w 0 + --ow_rate 0 — contrastive objective + overwrite
     augmentation off; CE-only

Each run records the held-out val-mIoU curve through the full runner
(host pipeline + jitted train step + batched masked validation), then a
projection-space class-separation probe on the held-out videos: the
mean within-class vs between-class cosine similarity of the contrastive
projections CoroCL optimizes (reference ProjectionHead output,
models/head/fpn_head.py via cavp_model.py:189-199). Gates:

  - held-out val mIoU >= 0.4 on either arm (~2.4x the 1/6-class chance
    floor) — the step GENERALIZES, not memorizes;
  - printed A-vs-B deltas for the verdict's "CoroCL does something"
    question (recorded either way in RESULTS_generalize.json).

Round-4 measured outcome (RESULTS_generalize.json): both arms ~0.50 /
0.55 held-out val mIoU (gate passed); CoroCL's val-mIoU delta on this
synthetic fixture is -0.056 (CE alone suffices for these masks), while
the projection-space separation probe shows the objective doing exactly
its job: between-class cosine 0.520 -> 0.054 (margin 0.429 -> 0.876)
with CoroCL on. Both directions recorded.

Usage: python scripts/generalize_smoke.py [--quick]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.utils.hostfp import set_compile_cache

set_compile_cache("/tmp/jax_tpu_cache")

NUM_CLASSES = 6
EPOCHS = 60


class _Cached:
    """Memoize decoded items (1-core host; see overfit_smoke)."""

    def __init__(self, ds):
        self.ds, self.cache = ds, {}

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        if i not in self.cache:
            self.cache[i] = self.ds[i]
        return self.cache[i]


def separation_probe(cfg, state, test_ds, n_videos=8):
    """Within- vs between-class cosine similarity of the contrastive
    projections on held-out items. CoroCL's InfoNCE directly optimizes
    this geometry; CE alone has no term for it."""
    from cavp_tpu.engine.runner import build_model

    model = build_model(cfg)
    imgs, waves, labels = [], [], []
    for i in range(min(n_videos, len(test_ds))):
        it = test_ds[i]  # eval-format video item: [10,H,W,3] / [10,L]
        imgs.append(it["image"][0])
        waves.append(it["waveform"][0].reshape(1, -1))
        labels.append(it["pix_label"][0])
    image = jnp.asarray(np.stack(imgs))
    wave = jnp.asarray(np.stack(waves))
    B = image.shape[0]

    from cavp_tpu.engine.loops import preprocess_audio
    audio = preprocess_audio(
        jnp.concatenate([wave, wave], 0), n_frames=cfg.mel_frames,
        spec_min=cfg.spec_min, spec_max=cfg.spec_max)

    @jax.jit
    def feats(params, batch_stats, image, audio):
        (_, fused2b, _), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, image, audio,
            eval_mode=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        f = fused2b[:B]
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    f = np.asarray(feats(state.params, state.batch_stats, image, audio))
    h, w = f.shape[1:3]
    lab = np.stack(labels).astype(np.int32)
    stride = lab.shape[1] // h
    lab_s = lab[:, ::stride, ::stride][:, :h, :w]

    cents, present = [], []
    for c in range(1, NUM_CLASSES):
        m = lab_s == c
        if m.sum() == 0:
            continue
        v = f[m].mean(0)
        cents.append(v / (np.linalg.norm(v) + 1e-8))
        present.append(c)
    cents = np.stack(cents)
    within = []
    # iterate the PRESENT classes only: zipping range(1, NUM_CLASSES)
    # against the skip-compacted cents would pair class c with another
    # class's centroid whenever any class is absent at feature res
    # (and an empty mask would NaN the mean)
    for c, cen in zip(present, cents):
        m = lab_s == c
        within.append(float((f[m] @ cen).mean()))
    gram = cents @ cents.T
    off = gram[~np.eye(len(cents), dtype=bool)]
    return {"within_cos": round(float(np.mean(within)), 4),
            "between_cos": round(float(np.mean(off)), 4),
            "margin": round(float(np.mean(within) - np.mean(off)), 4),
            "n_classes_present": int(len(cents))}


def run_one(tag, base, cfg_overrides, max_steps=None):
    from cavp_tpu.config import get_config
    from cavp_tpu.data.avss import AVSSDataset
    from cavp_tpu.data.pipeline import collate_train_videos
    from cavp_tpu.engine import runner as runner_mod
    from cavp_tpu.engine.runner import run_training

    cfg = get_config("avss").replace(
        image_width=224, image_height=224, num_classes=NUM_CLASSES,
        batch_size=8, epochs=EPOCHS, lr=3e-3, resize_flag=True,
        num_workers=8, compute_dtype="bfloat16", ignore_ckpt=True,
        max_view=128, class_slots=8, warm_up_epoch=5, **cfg_overrides)

    heldout = {}

    def make_datasets(config):
        train = _Cached(AVSSDataset(config, "train", dir_base=base))
        test = _Cached(AVSSDataset(config, "test", dir_base=base))
        heldout["test"] = test
        return train, test, collate_train_videos

    curve = []
    orig_validation = runner_mod.run_validation

    def tracking_validation(*args, **kwargs):
        results = orig_validation(*args, **kwargs)
        curve.append(results["miou"])
        print(json.dumps({"run": tag, "event": "validation",
                          "n": len(curve),
                          "miou": round(results["miou"], 4)}), flush=True)
        return results

    runner_mod.run_validation = tracking_validation
    t0 = time.time()
    try:
        state, best = run_training(
            cfg, "avss", make_datasets,
            ckpt_dir=os.path.join(tempfile.mkdtemp(prefix=f"gen_{tag}_"),
                                  "ckpt"),
            max_steps_per_epoch=max_steps)
    finally:
        runner_mod.run_validation = orig_validation
    dt = time.time() - t0
    sep = separation_probe(cfg, state, heldout["test"].ds)
    out = {"run": tag, "best_val_miou": round(best, 4),
           "final_val_miou": round(curve[-1], 4) if curve else None,
           "curve": [round(c, 4) for c in curve],
           "steps": int(state.step), "wall_s": round(dt, 1),
           "separation": sep}
    print(json.dumps(out), flush=True)
    return out


def main():
    quick = "--quick" in sys.argv
    global EPOCHS
    if quick:
        EPOCHS = 10

    tmp = tempfile.mkdtemp(prefix="generalize_")
    from cavp_tpu.data.synthetic import make_synthetic_avss
    # 24 train / 12 held-out videos; both splits draw from one RNG so
    # backgrounds, positions and (train vs test) video identities differ
    base = make_synthetic_avss(tmp, num_videos=24, image_size=224,
                               num_classes=NUM_CLASSES, ambiguous=True,
                               vary_pos=True, splits=("train", "test"))
    # thin the test split to 12 videos (builder makes num_videos per
    # split) by rewriting metadata — keeps eval wall-clock bounded
    meta = os.path.join(base, "metadata.csv")
    rows = open(meta).read().strip().splitlines()
    kept = [r for r in rows
            if not (r.startswith("test,")
                    and int(r.split(",")[2].split("vid")[1]) >= 12)]
    open(meta, "w").write("\n".join(kept) + "\n")

    a = run_one("corocl_on", base, {})
    b = run_one("corocl_off", base, {"corocl_w": 0.0, "ow_rate": 0.0})

    summary = {
        "what": ("held-out generalization + CoroCL-effect A/B on an "
                 "audio-decisive synthetic fixture (ambiguous tints, "
                 "varied positions, disjoint train/val videos)"),
        "corocl_on": a, "corocl_off": b,
        "delta_best_val_miou": round(a["best_val_miou"]
                                     - b["best_val_miou"], 4),
        "delta_separation_margin": round(
            a["separation"]["margin"] - b["separation"]["margin"], 4),
        # >= 0.4 ~= 2.4x the 1/6-class chance floor on EITHER arm:
        # the gate is about generalization (held-out videos), not about
        # which objective wins on a synthetic fixture
        "gate": "max(best_val_miou) >= 0.4 (~2.4x chance)",
        "pass": bool(max(a["best_val_miou"], b["best_val_miou"]) >= 0.4),
    }
    print(json.dumps(summary), flush=True)
    with open("RESULTS_generalize.json", "w") as f:
        json.dump(summary, f, indent=1)
    if not summary["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
