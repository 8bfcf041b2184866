"""Jitted train / eval step builders.

Rebuilds the four trainer classes' hot loops (``trainer/trainer_cavp_*``)
as pure step functions compiled once per setup:

- :func:`make_train_step` — the CoroCL batch construction
  (shuffle-permute, overwrite-miss-match, SoundBank FIFO, matched ‖
  shuffled duplicate forward), CE + CoroCL objective, multi-group
  SGD/Adam update, all inside one XLA program. Per-setup differences
  (`trainer_cavp_avss_image` vs `vpo_mono` vs `vpo_stereo`) are the
  static ``variant`` knobs.
- :func:`make_eval_step` — the per-video validation loop
  (`trainer_cavp_avss_image.py:409-534`) rebuilt as a *batched* step
  over padded [B, T] frame stacks with validity masks (the reference
  runs batch-1 python loops with per-frame .cpu() syncs; this is where
  the ≥5x eval throughput comes from). Metric accumulators (MIoU,
  ForegroundDetect for ALL + multi-source subsets) are carried device
  state.
- :func:`make_jf_test_step` — the AVS-Object J&F test path
  (`trainer_cavp_avs_obj.py:292-353`): per-video mask_iou + F-measure.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cavp_tpu.audio.mel import preprocess_audio as _preprocess_nchw
from cavp_tpu.losses import corocl_loss, cross_entropy
from cavp_tpu.metrics import (
    eval_fmeasure,
    fg_init,
    fg_update_weighted,
    mask_iou,
    miou_init,
    miou_update_weighted,
)
from cavp_tpu.models.soundbank import (
    overwrite_from_bank,
    overwrite_miss_match,
    update_bank,
)


def preprocess_audio(wave, **kw):
    """Trainer mel ([N,C,L] -> [N,T,64,C] NHWC for the flax towers)."""
    mel = _preprocess_nchw(wave, **kw)  # [N, C, T, F]
    return jnp.transpose(mel, (0, 2, 3, 1))

# ---------------------------------------------------------------------------
# Train
# ---------------------------------------------------------------------------


def make_train_step(
    model,
    tx,
    config,
    *,
    variant: str = "avss",      # "avss" | "vpo_mono" | "vpo_stereo"
):
    """Returns train_step(state, batch, rng, epoch) -> (state, metrics).

    batch: image [B,H,W,3] (normalized), waveform [B,Ca,L],
    pix_label [B,H,W] int32, img_label [B,num_classes] int32 multi-hot.
    ``epoch`` is a traced scalar — the reference's epoch>=1 gates stay
    inside one compiled step.
    """
    n_frames = config.mel_frames
    if variant == "baseline":
        return _make_baseline_train_step(model, tx, config)
    use_wave_bank = variant in ("avss", "vpo_mono") and not (
        variant == "avss" and (config.avsbench_split != "all"
                               or config.setup == "avss_binary"))
    use_overwrite = variant != "avss" or (
        config.avsbench_split == "all" and config.setup != "avss_binary")
    filter_bg_only = variant == "vpo_stereo"
    use_pallas = getattr(config, "use_pallas_mel", False)
    # Fused Pallas train-path fusion (fwd + hand-written VJP backward,
    # ops/pallas/fusion_train_kernel.py): the dup=2 fusion chain runs in
    # VMEM both ways, so AD's fusion-stage activation stashes (the
    # [2B,N,4C] GELU input alone is ~490 MB at b32/224-sq) never touch
    # HBM. DeepLab variants only (the decomposed forward needs the CAVP
    # method surface); numerically pinned vs the module path in
    # tests/test_fusion_train_kernel.py.
    use_fused_fusion = (getattr(config, "use_pallas_fusion_train", False)
                        and _decomposable(model)
                        and getattr(model, "seg_model", "")
                        == "DeepLabV3Plus")

    def train_step(state, batch, rng, epoch):
        image = batch["image"]
        waveform = batch["waveform"]          # [B, Ca, L]
        pix_label = batch["pix_label"]
        img_label = batch["img_label"]
        B = image.shape[0]

        k_shuffle, k_ow, k_ctr, k_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 4)

        ow_flag = epoch >= 1

        # --- shuffle batch construction (trainer_cavp_avss_image.py:178-198)
        # An explicit batch["shuffle_idx"] overrides the on-device
        # permutation: the torch reference draws it from host RNG
        # (torch.randperm), so cross-framework train-step parity tests
        # inject one permutation into both sides.
        if "shuffle_idx" in batch:
            shuffle_idx = batch["shuffle_idx"]
        else:
            shuffle_idx = jax.random.permutation(k_shuffle, B)
        shuffle_img_label = img_label[shuffle_idx]
        if_match = jnp.all(img_label == shuffle_img_label, axis=1)
        shuffle_wave = waveform[shuffle_idx]

        sound_bank = state.sound_bank
        sound_bank_pre = sound_bank  # overwrite reads the pre-update bank
        change_mask = jnp.zeros((B,), bool)
        target_class = jnp.zeros((B,), jnp.int32)
        if use_overwrite:
            ow = overwrite_miss_match(
                k_ow, if_match, shuffle_img_label, img_label,
                config.ow_rate, filter_bg_only=filter_bg_only,
                enabled=ow_flag)
            if_match, shuffle_img_label = ow.if_match, ow.shuffle_img_label
            if use_wave_bank:
                change_mask = ow.change_mask & ow_flag
                target_class = ow.target_class
                banked = overwrite_from_bank(
                    sound_bank, shuffle_wave.reshape(B, -1),
                    change_mask, ow.target_class)
                shuffle_wave = banked.reshape(shuffle_wave.shape)
        if use_wave_bank:
            sound_bank = update_bank(
                sound_bank, waveform.reshape(B, -1), img_label,
                per_label=False)

        # vpo_stereo uses the reference's audio_func=True convention
        # (trainer_cavp_vpo_stereo.py:211 -> cavp_model.py:156-173): the
        # audio tower runs on the B *unshuffled* clips and the shuffled
        # half is a feature gather fea_a[shuffle_idx] — which also keeps
        # the tower's train-mode BN batch at B. The other trainers
        # concatenate waveforms (matched ‖ shuffled/bank-overwritten)
        # and run the tower on 2B.
        gather_audio = variant == "vpo_stereo"
        audio_gather_idx = shuffle_idx if gather_audio else None
        # Exact audio-tower dedup (avss + VGG tower, which is per-clip —
        # no BatchNorm): the shuffled half of the reference's 2B clip
        # batch is a permutation of the matched half except for the
        # bank-overwritten rows, of which there are at most
        # floor(B*ow_rate) (overwrite_miss_match selects
        # floor(n_false*ow_rate) with n_false <= B). So the tower runs
        # on B + floor(B*ow_rate) clips and the shuffled half becomes a
        # feature gather — row-for-row the same values. The injected-mel
        # parity path keeps the 2B convention; a step-level equivalence
        # test (tests/test_audio_dedup.py) pins dedup-on == dedup-off.
        dedup_audio = (variant == "avss" and config.audio_backbone == "vgg"
                       and getattr(config, "audio_dedup", True))
        if "mel" in batch:
            # Parity-harness injection: a precomputed mel ([2B,...] or
            # [B,...] for the gather convention). The mel frontend is
            # f32 internally, and two separate compilations of it
            # aren't bit-identical — the fp64 train-parity driver feeds
            # both frameworks one tensor instead. Production never sets
            # this key.
            audio = batch["mel"]
        else:
            if gather_audio:
                input_wave = waveform
            elif dedup_audio:
                K = (min(B, int(B * config.ow_rate))
                     if (use_overwrite and use_wave_bank) else 0)
                if K > 0:
                    # changed rows first, in batch order (stable sort);
                    # slot j holds the j-th overwritten row's bank wave.
                    slots = jnp.argsort(~change_mask, stable=True)[:K]
                    bw = sound_bank_pre[target_class[slots], 0]
                    input_wave = jnp.concatenate(
                        [waveform, bw.reshape((K,) + waveform.shape[1:])],
                        axis=0)
                    rank = jnp.cumsum(change_mask.astype(jnp.int32)) - 1
                    audio_gather_idx = jnp.where(
                        change_mask, B + jnp.clip(rank, 0, K - 1),
                        shuffle_idx)
                else:
                    input_wave = waveform
                    audio_gather_idx = shuffle_idx
            else:
                input_wave = jnp.concatenate([waveform, shuffle_wave],
                                             axis=0)
            audio = preprocess_audio(input_wave, n_frames=n_frames,
                                     spec_min=config.spec_min,
                                     spec_max=config.spec_max,
                                     use_pallas=use_pallas)

        # shuffle GT rules (trainer_cavp_avss_image.py:209-212)
        gt_shuffle = jnp.where(if_match[:, None, None], pix_label, 0)

        extra = tuple(getattr(config, "extra_losses", ()) or ())

        def loss_fn(params):
            if use_fused_fusion:
                from cavp_tpu.ops.pallas.fusion_train_kernel import \
                    fusion_train

                # Each method-apply returns the FULL batch_stats
                # collection (untouched entries at their input values),
                # so the updated stats are THREADED through the three
                # applies — the methods touch disjoint BN submodules —
                # and the last apply's collection is the new state.
                fea_v, mut_v = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    image, True,
                    method="forward_visual_feature",
                    mutable=["batch_stats"])
                fea_a, mut_a = model.apply(
                    {"params": params,
                     "batch_stats": mut_v["batch_stats"]},
                    audio, True,
                    method="forward_audio_feature",
                    mutable=["batch_stats"])
                if audio_gather_idx is not None:
                    fea_a = jnp.concatenate(
                        [fea_a[:B], fea_a[audio_gather_idx]], axis=0)
                _, hh, wh, cc = fea_v.shape
                # CAVP pins CROSS_ATTENTION at 4 heads (attn.py:173,235)
                tokens = fusion_train(params, fea_v, fea_a, num_heads=4)
                fused2b = tokens.reshape(2 * B, hh, wh, cc)
                head_in = (fused2b[:B]
                           if getattr(model, "cls_matched_only", True)
                           else fused2b)
                logits2b, mut_c = model.apply(
                    {"params": params,
                     "batch_stats": mut_a["batch_stats"]},
                    head_in, image.shape[1:3], True,
                    method="forward_cls", mutable=["batch_stats"])
                new_bs = mut_c["batch_stats"]
                pack = {"audio": fea_a}
            else:
                (logits2b, fused2b, pack), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    image, audio, eval_mode=False,
                    audio_gather_idx=audio_gather_idx,
                    mutable=["batch_stats"],
                    rngs={"dropout": k_drop})  # HRNet/OCR head Dropout2d
                new_bs = mutated["batch_stats"]
            output = logits2b[:B]  # + 0*logits2b[B:] — identical gradient
            l_ce = cross_entropy(output, pix_label)
            l_ctr, aux = corocl_loss(
                k_ctr, fused2b[:B], pix_label, fused2b[B:], gt_shuffle,
                num_classes=config.num_classes,
                temperature=config.cl_temp,
                max_views=config.max_view,
                class_slots=config.class_slots)
            loss = l_ce + config.corocl_w * l_ctr
            # optional auxiliary objectives (Losser's dormant losses,
            # loss/losser.py:54-57), weighted by loss_w
            if "av_contrast" in extra:
                from cavp_tpu.losses import av_contrast_loss

                h, w = fused2b.shape[1:3]
                tokens = fused2b[:B].reshape(B, h * w, -1)
                l_av = av_contrast_loss(tokens, pack["audio"][:B], pix_label,
                                        temperature=config.cl_temp,
                                        feat_hw=(h, w))
                loss = loss + config.loss_w * l_av
                aux = {**aux, "loss/l_av_contrast": l_av}
            if "pixel_contrast" in extra:
                from cavp_tpu.losses import pixel_contrast_loss

                l_px = pixel_contrast_loss(
                    jax.random.fold_in(k_ctr, 1), fused2b[:B], output,
                    pix_label, temperature=config.cl_temp)
                loss = loss + config.loss_w * l_px
                aux = {**aux, "loss/l_pixel_contrast": l_px}
            return loss, (new_bs, l_ce, l_ctr, aux)

        (loss, (new_bs, l_ce, l_ctr, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            sound_bank=sound_bank,
        )
        metrics = {
            "loss/loss": loss,
            "loss/cross_entropy": l_ce,
            "loss/l_ctr_av": l_ctr,
            **aux,
        }
        return new_state, metrics

    return train_step


def _make_baseline_train_step(model, tx, config):
    """``--use_baseline`` (main_avss_resize.py:92-104): visual-only
    VisualModel, plain CE objective — no shuffle batch, no SoundBank,
    no contrastive terms."""

    def train_step(state, batch, rng, epoch):
        del epoch
        image = batch["image"]
        pix_label = batch["pix_label"]

        k_drop = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            (logits, _, _), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, None, eval_mode=False, mutable=["batch_stats"],
                rngs={"dropout": k_drop})  # HRNet/OCR head Dropout2d
            l_ce = cross_entropy(logits, pix_label)
            return l_ce, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, {"loss/loss": loss, "loss/cross_entropy": loss}

    return train_step


# ---------------------------------------------------------------------------
# Eval (AVSS validation: MIoU + ForegroundDetect, ALL + MS subsets)
# ---------------------------------------------------------------------------


class EvalMetrics(NamedTuple):
    miou_all: Any
    miou_ms: Any
    fg_all: jnp.ndarray
    fg_ms: jnp.ndarray


def eval_metrics_init(num_classes: int) -> EvalMetrics:
    return EvalMetrics(
        miou_all=miou_init(num_classes),
        miou_ms=miou_init(num_classes),
        fg_all=fg_init(num_classes),
        fg_ms=fg_init(num_classes),
    )


def eval_metrics_result(m: EvalMetrics) -> Dict[str, jnp.ndarray]:
    from cavp_tpu.metrics import fg_result, miou_result

    v_miou, v_acc = miou_result(m.miou_all)
    v_miou_ms, v_acc_ms = miou_result(m.miou_ms)
    fd, f1, f03 = fg_result(m.fg_all)
    fd_ms, f1_ms, f03_ms = fg_result(m.fg_ms)
    return {
        "miou": v_miou, "acc": v_acc, "fdr": fd, "f_1": f1, "f_0.3": f03,
        "miou_ms": v_miou_ms, "acc_ms": v_acc_ms, "fdr_ms": fd_ms,
        "f_1_ms": f1_ms, "f_0.3_ms": f03_ms,
    }


def _multi_source_flag(pix_label: jnp.ndarray, thresh: int = 100) -> jnp.ndarray:
    """validation's MS gate (trainer_cavp_avss_image.py:449-451): more
    than 2 label values (incl. bg/ignore) covering >100 px each.
    Compare+reduce instead of scatter (see metrics.miou._frame_hist)."""
    flat = jnp.clip(pix_label.reshape(-1, 1), 0, 255)
    values = jnp.arange(256, dtype=flat.dtype).reshape(1, -1)
    hist = jnp.sum((flat == values).astype(jnp.float32), axis=0)
    return jnp.sum(hist > thresh) > 2


def _decomposable(model) -> bool:
    return all(hasattr(model, m) for m in
               ("forward_visual_feature", "forward_audio_feature",
                "forward_cls"))


def _make_visual_feature_fn(model, config):
    """fea_v(variables, image) -> [B,h,w,latent], optionally routing
    layer1 through the fused Pallas residual-stage kernel
    (:mod:`cavp_tpu.ops.pallas.layer1_kernel`) — the bandwidth-bound row
    of the visual ladder runs as one VMEM pass per image. Eval only;
    DeepLabV3Plus/ResNet variants; maps beyond the kernel's VMEM tile
    gate (512-sq images) fall back to the module path."""
    use_l1 = (getattr(config, "use_pallas_layer1", False)
              and getattr(model, "seg_model", "") == "DeepLabV3Plus")
    if not use_l1:
        def fea_v_fn(variables, image):
            return model.apply(variables, image, False,
                               method="forward_visual_feature")
        return fea_v_fn

    from cavp_tpu.ops.pallas.layer1_kernel import fused_layer1, layer1_fits

    def fea_v_fn(variables, image):
        h, w = image.shape[1:3]
        # True stem map size: two SAME stride-2 stages round UP, so the
        # map is ceil(h/4) — h//4 under-counts for h just above a
        # multiple of 4 (385 -> 97, not 96) and would route a too-big
        # map into the kernel's hard ValueError instead of falling back.
        sh, sw = -(-h // 4), -(-w // 4)
        if not (layer1_fits(sh, sw) and "batch_stats" in variables):
            return model.apply(variables, image, False,
                               method="forward_visual_feature")
        stem = model.apply(variables, image, False,
                           method=lambda m, im, tr: m.backbone.stem_forward(im, tr))
        c1 = fused_layer1(variables["params"]["backbone"],
                          variables["batch_stats"]["backbone"], stem)
        feats = model.apply(
            variables, c1, False,
            method=lambda m, c, tr: m.backbone.forward_from_c1(c, tr))
        return model.apply(
            variables, feats, False,
            method=lambda m, f, tr: m.segment.forward_feature(f, tr))

    return fea_v_fn


def make_inference_forward(model, config):
    """Returns fwd(variables, image, audio) -> logits for the eval path.

    With ``config.use_pallas_fusion`` (and a CAVP-style model exposing
    the forward_visual_feature / forward_cls methods), the fusion stage
    runs through the fused Pallas kernel
    (:mod:`cavp_tpu.ops.pallas.fusion_kernel`) instead of the flax
    composition — same math, one VMEM-resident pass over the tokens.
    With ``config.use_pallas_layer1`` the visual tower's layer1 stage
    likewise runs through its fused kernel.
    """
    use_fused = getattr(config, "use_pallas_fusion", False) and \
        _decomposable(model)
    use_l1 = getattr(config, "use_pallas_layer1", False) and \
        _decomposable(model)
    if not (use_fused or use_l1):
        def fwd(variables, image, audio):
            logits, _, _ = model.apply(variables, image, audio,
                                       eval_mode=True)
            return logits
        return fwd

    fea_v_fn = _make_visual_feature_fn(model, config)
    if use_fused:
        from cavp_tpu.ops.pallas.fusion_kernel import fused_visual_fusion

    def fwd(variables, image, audio):
        fea_v = fea_v_fn(variables, image)
        fea_a = model.apply(variables, audio, False,
                            method="forward_audio_feature")
        b, h, w, c = fea_v.shape
        if use_fused:
            # CAVP pins CROSS_ATTENTION at 4 heads (models/attn.py:173,235)
            tokens = fused_visual_fusion(variables["params"], fea_v, fea_a,
                                         num_heads=4)
            fused = tokens.reshape(b, h, w, c)
        else:
            fused, _ = model.apply(variables, fea_v, fea_a,
                                   method="forward_fusion")
        return model.apply(variables, fused, image.shape[1:3], False,
                           method="forward_cls")

    return fwd


def make_eval_pred_forward(model, config):
    """Returns pred_fn(variables, image, audio) -> int32 argmax mask.

    The metric path only consumes the argmax of the upsampled logits —
    with ``use_pallas_fusion`` the classifier-resolution logits go
    through the fused bilinear-upsample+argmax kernel
    (:mod:`cavp_tpu.ops.pallas.upsample_argmax_kernel`), so the
    full-resolution logits tensor (~570 MB bf16 at bench shapes) never
    touches HBM. Bitwise-equal to argmax(plain logits) — the interp
    matrices have <=2 nonzeros per row, so the blocked matmuls round
    identically (pinned in tests/test_pallas_fusion.py).
    """
    use_fused = getattr(config, "use_pallas_fusion", False) and \
        _decomposable(model)
    if not use_fused:
        fwd = make_inference_forward(model, config)

        def pred_fn(variables, image, audio):
            return jnp.argmax(fwd(variables, image, audio),
                              axis=-1).astype(jnp.int32)
        return pred_fn

    from cavp_tpu.ops.pallas.fusion_kernel import fused_visual_fusion
    from cavp_tpu.ops.pallas.upsample_argmax_kernel import upsample_argmax
    from cavp_tpu.ops.interp import interpolate_bilinear
    use_pallas_argmax = getattr(config, "use_pallas_argmax", False)
    fea_v_fn = _make_visual_feature_fn(model, config)

    def pred_fn(variables, image, audio):
        fea_v = fea_v_fn(variables, image)
        fea_a = model.apply(variables, audio, False,
                            method="forward_audio_feature")
        b, h, w, c = fea_v.shape
        tokens = fused_visual_fusion(variables["params"], fea_v, fea_a,
                                     num_heads=4)
        head = model.apply(variables, tokens.reshape(b, h, w, c),
                           method=lambda m, f: m.segment.upsample(f, False))
        if use_pallas_argmax:
            return upsample_argmax(head, image.shape[1:3])
        logits = interpolate_bilinear(head, image.shape[1:3],
                                      align_corners=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return pred_fn


def make_eval_step(model, config):
    """Returns eval_step(variables, metrics, batch) -> metrics.

    batch: image [N,H,W,3], waveform [N,Ca,L], pix_label [N,H,W],
    valid [N] (0/1 padding mask) — N = videos*frames flattened by the
    pipeline; padded frames carry valid=0.
    """
    n_frames = config.mel_frames
    use_pallas = getattr(config, "use_pallas_mel", False)
    pred_fwd = make_eval_pred_forward(model, config)

    def eval_step(variables, metrics: EvalMetrics, batch) -> EvalMetrics:
        image = batch["image"]
        audio = preprocess_audio(batch["waveform"], n_frames=n_frames,
                                 spec_min=config.spec_min,
                                 spec_max=config.spec_max,
                                 use_pallas=use_pallas)
        pix_label = batch["pix_label"]
        valid = batch["valid"].astype(jnp.float32)

        ms = jax.vmap(_multi_source_flag)(pix_label).astype(jnp.float32) * valid

        # argmax over the [N,H,W,C] logits once (fused into the upsample
        # kernel when use_pallas_fusion); per-frame histograms are
        # shared between the ALL and multi-source accumulators (weights
        # are per-frame 0/1 — exact, bitwise-equal to separate updates).
        pred = pred_fwd(variables, image, audio)
        miou_all, miou_ms = miou_update_weighted(
            (metrics.miou_all, metrics.miou_ms), pred, pix_label,
            (valid, ms))
        fg_all, fg_ms = fg_update_weighted(
            (metrics.fg_all, metrics.fg_ms), pred, pix_label, (valid, ms))
        return EvalMetrics(miou_all=miou_all, miou_ms=miou_ms,
                           fg_all=fg_all, fg_ms=fg_ms)

    return eval_step


# ---------------------------------------------------------------------------
# AVS-Object J&F test (S4 / MS3)
# ---------------------------------------------------------------------------


def make_jf_test_step(model, config):
    """Returns jf_step(variables, batch) -> (miou [V], fscore [V]) per
    video, batched over V videos.

    batch: image [V,T,H,W,3] or [T,H,W,3], waveform [V,T,Ca,L],
    pix_label [V,T,H,W] binary {0,1}, valid [V,T].
    Mirrors trainer_cavp_avs_obj.test:292-353 — J = per-video mask_iou on
    argmax masks, F = per-video Eval_Fmeasure on class-1 softmax — but
    runs all V*T frames through one forward (the reference loops videos
    at batch 1) and vmaps the per-video metric reductions.
    """
    n_frames = config.mel_frames

    def jf_step(variables, batch):
        image = batch["image"]
        single = image.ndim == 4
        if single:
            image = image[None]
        V, T = image.shape[:2]
        wave = batch["waveform"].reshape((V * T,) + batch["waveform"].shape[-2:])
        audio = preprocess_audio(wave, n_frames=n_frames,
                                 spec_min=config.spec_min,
                                 spec_max=config.spec_max)
        gt = batch["pix_label"].astype(jnp.float32).reshape(
            V, T, *batch["pix_label"].shape[-2:])
        valid = batch["valid"].reshape(V, T)

        flat_img = image.reshape((V * T,) + image.shape[2:])
        logits, _, _ = model.apply(variables, flat_img, audio, eval_mode=True)
        H, W = logits.shape[1:3]
        pred_mask = jnp.argmax(logits, axis=-1).astype(jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
        pred_mask = pred_mask.reshape(V, T, H, W)
        probs = probs.reshape(V, T, H, W)

        miou = jax.vmap(lambda p, g, w: mask_iou(p, g, weight=w))(
            pred_mask, gt, valid)
        fscore = jax.vmap(lambda p, g, w: eval_fmeasure(p, g, weight=w))(
            probs, gt, valid)
        if single:
            return miou[0], fscore[0]
        return miou, fscore

    return jf_step
