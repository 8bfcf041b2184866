"""Reference-faithful torch TRAINING oracle for end-to-end train-step
parity (VERDICT round-2 item 1).

Complements tests/torch_ref.py (the assembled model replica) with the
training composition the reference wires around it:

- ``TorchCoroCL`` — ``loss/contrastive_aud.py:7-142`` (GT nearest-
  downsample, L2 normalize, per-class/background/shuffle sampling,
  InfoNCE with pre-diagonal neg mask);
- ``group_weight`` / ``build_reference_optimizers`` — the exact
  param-group structure: 8 seg groups at lr*10 (``business_layer`` ×
  decay/no-decay, main_avss_resize.py:50-61, engine/utils.py:642-688),
  backbone decay/no-decay at lr*1, then visual_projector and cross_att
  as *plain* groups (weight decay applies to ALL their params, incl.
  LayerNorm affines and biases — they bypass group_weight), SGD with
  constructor (lr, momentum, weight_decay); Adam over the full audio
  model at constant args.lr (main_avss_resize.py:126-133);
- ``WarmUpPolyLR`` — engine/lr_policy.py:30-43;
- ``lr_step`` — trainer_cavp_avss_image.py:78-91: groups[:8] <- lr*10,
  groups[8:] <- lr, applied AFTER optimizer.step() so step i runs at
  schedule(i-1) and step 0 at the constructor lr;
- ``reference_train_step`` — the trainer hot-loop body
  (trainer_cavp_avss_image.py:175-240) at epoch 0 (ow path gated off by
  ``epoch >= 1``; the waveform SoundBank update cannot feed back into
  the loss at epoch 0 and is elided) with the shuffle permutation
  injected instead of torch.randperm, so the flax step can consume the
  identical permutation.

Test-only oracle: like torch_ref.py it is deliberately reference-
faithful, not TPU-idiomatic.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# CoroCL (loss/contrastive_aud.py)
class TorchCoroCL(nn.Module):
    def __init__(self, temperature=0.1, ignore_idx=255, max_views=512):
        super().__init__()
        self.temperature = temperature
        self.ignore_idx = ignore_idx
        self.max_views = max_views
        self.eps = 1e-12

    def info_nce(self, anchors, labels):
        labels = labels.view(-1, 1)
        mask = torch.eq(labels, labels.T).float()
        logits = (anchors @ anchors.T) / self.temperature
        logits = logits - logits.max(dim=1, keepdim=True).values.detach()
        # neg mask is computed BEFORE the diagonal removal (the
        # pre-diagonal subtlety, contrastive_aud.py:53-57)
        neg_mask = 1.0 - mask
        mask = mask * (1.0 - torch.eye(mask.shape[0]))
        neg_logits = (logits.exp() * neg_mask).sum(1, keepdim=True)
        log_prob = logits - (logits.exp() + neg_logits).log()
        mean_log_prob_pos = (mask * log_prob).sum(1) / (mask.sum(1) + self.eps)
        return -mean_log_prob_pos.mean()

    def forward(self, embeds_match, gt_match, embeds_shuffle, gt_shuffle):
        h, w = embeds_match.shape[2:]
        gt_m = F.interpolate(gt_match.unsqueeze(1).float(), size=(h, w),
                             mode="nearest").squeeze(1).long()
        gt_s = F.interpolate(gt_shuffle.unsqueeze(1).float(), size=(h, w),
                             mode="nearest").squeeze(1).long()
        em = F.normalize(embeds_match, p=2, dim=1)
        es = F.normalize(embeds_shuffle, p=2, dim=1)
        C = em.shape[1]
        em = em.flatten(2).permute(0, 2, 1).reshape(-1, C)
        es = es.flatten(2).permute(0, 2, 1).reshape(-1, C)
        gt_m = gt_m.flatten()
        gt_s = gt_s.flatten()

        fg = (gt_m > 0) & (gt_m != self.ignore_idx)
        anchors, labels = [], []
        for c in torch.unique(gt_m[fg]):
            idx = (fg & (gt_m == c)).nonzero(as_tuple=True)[0]
            if idx.numel() < self.max_views:
                continue
            perm = torch.randperm(idx.numel())[: self.max_views]
            anchors.append(em[idx[perm]])
            labels.append(gt_m[idx[perm]])
        if not anchors:
            return torch.tensor(0.0)

        bg_idx = (gt_m == 0).nonzero(as_tuple=True)[0]
        e_sh, g_sh = es[fg], gt_s[fg]
        sample_num = int(min(self.max_views, e_sh.shape[0], bg_idx.numel()))
        p1 = torch.randperm(bg_idx.numel())[:sample_num]
        p2 = torch.randperm(e_sh.shape[0])[:sample_num]
        anchors = torch.cat(anchors + [em[bg_idx[p1]], e_sh[p2]], dim=0)
        labels = torch.cat(labels + [gt_m[bg_idx[p1]], g_sh[p2]], dim=0)
        return self.info_nce(anchors, labels)


# ---------------------------------------------------------------------------
# Optimizer structure (set_group_lr + group_weight)
def group_weight(weight_group, module, lr):
    """engine/utils.py:642-688 for the module types the replica uses."""
    decay, no_decay = [], []
    for m in module.modules():
        if isinstance(m, (nn.Linear, nn.Conv1d, nn.Conv2d, nn.Conv3d)):
            decay.append(m.weight)
            if m.bias is not None:
                no_decay.append(m.bias)
        elif isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d,
                            nn.GroupNorm, nn.LayerNorm)):
            if m.weight is not None:
                no_decay.append(m.weight)
            if m.bias is not None:
                no_decay.append(m.bias)
    assert len(list(module.parameters())) == len(decay) + len(no_decay)
    weight_group.append(dict(params=decay, lr=lr))
    weight_group.append(dict(params=no_decay, weight_decay=0.0, lr=lr))
    return weight_group


def build_reference_optimizers(model, lr, momentum, weight_decay):
    """main_avss_resize.py:50-72,126-133 over the TorchCAVP replica.
    Group order matters (lr_step indexes [:8] / [8:])."""
    groups = []
    for module in (model.segment.aspp, model.segment.reduce,
                   model.segment.upsample.last_conv,
                   model.segment.upsample.classifier):
        groups = group_weight(groups, module, lr * 10.0)
    groups = group_weight(groups, model.backbone, lr)
    groups.append({"params": list(model.visual_projector.parameters()),
                   "lr": lr})
    groups.append({"params": list(model.cross_att.parameters()), "lr": lr})
    opt_v = torch.optim.SGD(groups, lr=lr, momentum=momentum,
                            weight_decay=weight_decay)
    opt_a = torch.optim.Adam(model.audio_backbone.parameters(), lr=lr)
    return opt_v, opt_a


def lr_step(opt_v, current_lr):
    """trainer_cavp_avss_image.py:78-91 (applied after optimizer.step)."""
    for g in opt_v.param_groups[:8]:
        g["lr"] = current_lr * 10.0
    for g in opt_v.param_groups[8:]:
        g["lr"] = current_lr


class WarmUpPolyLR:
    """engine/lr_policy.py:30-43."""

    def __init__(self, start_lr, lr_power, total_iters, warmup_steps,
                 end_lr=1e-8):
        self.start_lr = start_lr
        self.lr_power = lr_power
        self.total_iters = float(total_iters)
        self.warmup_steps = warmup_steps
        self.end_lr = end_lr

    def get_lr(self, cur_iter):
        if cur_iter < self.warmup_steps:
            return self.start_lr * (cur_iter / self.warmup_steps)
        lr = self.start_lr * (1 - cur_iter / self.total_iters) ** self.lr_power
        return min(max(lr, self.end_lr), self.start_lr)


# ---------------------------------------------------------------------------
# The trainer hot-loop body (trainer_cavp_avss_image.py:175-240)
def reference_train_step(model, corocl, opt_v, opt_a, scheduler, cur_iter,
                         image, mel_2b, pix_label, img_label, shuffle_idx):
    """One optimizer step at epoch 0 (no overwrite path). ``mel_2b`` is
    the preprocessed [2B,1,96,64] spectrogram of cat(wave, wave[shuffle])
    — audio frontend parity is pinned separately (tests/test_audio_mel),
    so both frameworks consume the identical mel here. Returns
    (loss, l_ce, l_ctr) floats."""
    model.train()
    B = image.shape[0]
    opt_v.zero_grad()
    opt_a.zero_grad()

    shuffle_img_label = img_label.clone()[shuffle_idx]
    shuffle_pix_label = pix_label.clone()[shuffle_idx]
    if_match = torch.all(torch.eq(img_label, shuffle_img_label), dim=1)

    output_cat, ctr_feature_cat, _ = model.forward_train(image, mel_2b)
    output = output_cat[:B] + output_cat[B:] * 0.0

    shuffle_pix_label[~if_match] = 0
    shuffle_pix_label[if_match] = pix_label[if_match]

    l_ctr = corocl(ctr_feature_cat[:B], pix_label,
                   ctr_feature_cat[B:], shuffle_pix_label)
    l_ce = F.cross_entropy(output, pix_label, ignore_index=255)
    loss = l_ce + l_ctr
    loss.backward()
    opt_v.step()
    opt_a.step()

    current_lr = scheduler.get_lr(cur_iter)
    lr_step(opt_v, current_lr)
    return float(loss.detach()), float(l_ce.detach()), float(l_ctr.detach())


def reference_train_step_stereo(model, corocl, opt_v, opt_a, scheduler,
                                cur_iter, image, mel_b, pix_label,
                                img_label, shuffle_idx):
    """The vpo_stereo trainer hot-loop body
    (trainer_cavp_vpo_stereo.py:183-236) at epoch 0: single-frame
    batches, stereo mel of the B *unshuffled* clips, audio_func=True
    forward (feature-gather shuffle half). ``mel_b`` is [B,2,96,64]."""
    model.train()
    B = image.shape[0]
    opt_v.zero_grad()
    opt_a.zero_grad()

    shuffle_img_label = img_label.clone()[shuffle_idx]
    shuffle_pix_label = pix_label.clone()[shuffle_idx]
    if_match = torch.all(torch.eq(img_label, shuffle_img_label), dim=1)

    output_cat, ctr_feature_cat, _ = model.forward_train_gather(
        image, mel_b, shuffle_idx)
    output = output_cat[:B] + output_cat[B:] * 0.0

    shuffle_pix_label[~if_match] = 0
    shuffle_pix_label[if_match] = pix_label[if_match]

    l_ctr = corocl(ctr_feature_cat[:B], pix_label,
                   ctr_feature_cat[B:], shuffle_pix_label)
    l_ce = F.cross_entropy(output, pix_label, ignore_index=255)
    loss = l_ce + l_ctr
    loss.backward()
    opt_v.step()
    opt_a.step()

    current_lr = scheduler.get_lr(cur_iter)
    lr_step(opt_v, current_lr)
    return float(loss.detach()), float(l_ce.detach()), float(l_ctr.detach())
