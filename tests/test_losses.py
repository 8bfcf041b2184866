"""Loss tests: CE vs torch, CoroCL vs an independent dynamic-shape
numpy InfoNCE on deterministically-sampleable inputs (SURVEY.md §4d)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from cavp_tpu.losses import (
    corocl_loss,
    cross_entropy,
    ohem_cross_entropy,
    supcon_loss,
)


class TestCrossEntropy:
    def test_matches_torch_with_ignore(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 8, 8, 5).astype(np.float32)
        labels = rng.randint(0, 5, (2, 8, 8))
        labels[0, :3] = 255
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        t = tF.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels).long(), ignore_index=255)
        np.testing.assert_allclose(ours, t.item(), rtol=1e-5)

    def test_all_ignored_is_finite(self):
        logits = jnp.zeros((1, 4, 4, 3))
        labels = jnp.full((1, 4, 4), 255)
        assert np.isfinite(float(cross_entropy(logits, labels)))


def _info_nce_numpy(anchors, labels, temp=0.1):
    """Independent implementation of contrastive_aud.info_nce math."""
    eps = 1e-12
    a = np.asarray(anchors, np.float64)
    lab = np.asarray(labels)
    mask = (lab[:, None] == lab[None, :]).astype(np.float64)
    logits = a @ a.T / temp
    logits = logits - logits.max(axis=1, keepdims=True)
    neg = ((1 - mask) * np.exp(logits)).sum(1, keepdims=True)
    np.fill_diagonal(mask, 0.0)
    log_prob = logits - np.log(np.exp(logits) + neg)
    mean_pos = (mask * log_prob).sum(1) / (mask.sum(1) + eps)
    return -mean_pos.mean()


class TestCoroCL:
    def _deterministic_case(self):
        """8x8 feature map, every sampling group has exactly max_views
        eligible pixels (or constant embeddings), so the static sampler's
        choice set equals the reference's and the loss is deterministic."""
        h = w = 8
        C = 6
        mv = 16
        rng = np.random.RandomState(0)
        gt = np.zeros((h * w,), np.int64)
        gt[:16] = 1
        gt[16:32] = 2
        gt[32:48] = 0          # exactly 16 background px
        gt[48:] = 255          # ignored
        em = rng.randn(h * w, C).astype(np.float32)
        es = np.tile(rng.randn(1, C).astype(np.float32), (h * w, 1))
        gts = np.zeros((h * w,), np.int64)  # shuffle gt: all background
        return h, w, C, mv, gt, em, es, gts

    def test_matches_dynamic_reference_math(self):
        h, w, C, mv, gt, em, es, gts = self._deterministic_case()
        loss, aux = corocl_loss(
            jax.random.PRNGKey(0),
            jnp.asarray(em.reshape(1, h, w, C)),
            jnp.asarray(gt.reshape(1, h, w)),
            jnp.asarray(es.reshape(1, h, w, C)),
            jnp.asarray(gts.reshape(1, h, w)),
            num_classes=4, max_views=mv, class_slots=4)
        assert int(aux["corocl/eligible_classes"]) == 2
        assert int(aux["corocl/anchor_count"]) == 4 * mv

        # expected: anchors = class1 px + class2 px + all bg px + 16
        # copies of the constant shuffle embedding labeled 0
        def norm(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        emn, esn = norm(em.astype(np.float64)), norm(es.astype(np.float64))
        anchors = np.concatenate(
            [emn[:16], emn[16:32], emn[32:48], esn[:16]], axis=0)
        labels = np.concatenate([gt[:16], gt[16:32], gt[32:48], gts[:16]])
        exp = _info_nce_numpy(anchors, labels)
        np.testing.assert_allclose(float(loss), exp, rtol=1e-4)

    def test_no_eligible_class_returns_zero(self):
        h = w = 8
        em = jnp.asarray(np.random.randn(1, h, w, 4), jnp.float32)
        gt = jnp.zeros((1, h, w), jnp.int32)  # background only
        loss, aux = corocl_loss(jax.random.PRNGKey(0), em, gt, em, gt,
                                num_classes=4, max_views=16, class_slots=2)
        assert float(loss) == 0.0

    def test_gradient_flows(self):
        h, w, C, mv, gt, em, es, gts = self._deterministic_case()

        def f(e):
            loss, _ = corocl_loss(
                jax.random.PRNGKey(1), e.reshape(1, h, w, C),
                jnp.asarray(gt.reshape(1, h, w)),
                jnp.asarray(es.reshape(1, h, w, C)),
                jnp.asarray(gts.reshape(1, h, w)),
                num_classes=4, max_views=mv, class_slots=4)
            return loss

        g = jax.grad(f)(jnp.asarray(em))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_blocked_topk_equals_flat(self):
        """The round-5 per-image-block exact top-k (losses/corocl.py
        _topk_blocked) must return the identical selection, in the same
        order, as the flat lax.top_k — for every (B, hw, k) shape class
        the sampler hits, including sparse masks."""
        from cavp_tpu.losses.corocl import _sample_group

        rng = np.random.RandomState(7)
        for B, hw, k in ((4, 64, 16), (8, 3136 // 4, 64), (2, 3136, 512)):
            P = B * hw
            for density in (1.0, 0.3, 0.01):
                mask = jnp.asarray(rng.rand(P) < density)
                key = jax.random.PRNGKey(int(density * 100) + P)
                i_flat, v_flat = _sample_group(key, mask, k, block=0)
                i_blk, v_blk = _sample_group(key, mask, k, block=hw)
                np.testing.assert_array_equal(np.asarray(v_flat),
                                              np.asarray(v_blk))
                # valid draws must match exactly (invalid tails may
                # legitimately differ — they are -inf ties)
                vf = np.asarray(v_flat)
                np.testing.assert_array_equal(
                    np.asarray(i_flat)[vf], np.asarray(i_blk)[vf])

    def test_loss_identical_flat_vs_blocked(self):
        h, w, C, mv, gt, em, es, gts = self._deterministic_case()
        args = (jnp.asarray(em.reshape(1, h, w, C)),
                jnp.asarray(gt.reshape(1, h, w)),
                jnp.asarray(es.reshape(1, h, w, C)),
                jnp.asarray(gts.reshape(1, h, w)))
        kw = dict(num_classes=4, max_views=mv, class_slots=4)
        # 2-image batch so nb > 1 and the blocked path actually engages
        args2 = tuple(jnp.concatenate([a, a], axis=0) for a in args)
        l_flat, _ = corocl_loss(jax.random.PRNGKey(3), *args2, **kw)
        l_blk, _ = corocl_loss(jax.random.PRNGKey(3), *args2,
                               _blocked_topk=True, **kw)
        assert float(l_flat) == float(l_blk)


class TestOhem:
    def test_keeps_hard_pixels(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(1, 8, 8, 4).astype(np.float32) * 5
        labels = rng.randint(0, 4, (1, 8, 8))
        full = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        ohem = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                        thresh=0.6, min_kept=8))
        assert ohem >= full  # hard mining raises mean loss
        assert np.isfinite(ohem)


class TestSupCon:
    def test_matches_torch_formula(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(4, 2, 8).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        labels = np.array([0, 1, 0, 2])
        ours = float(supcon_loss(jnp.asarray(feats), jnp.asarray(labels)))

        # independent torch computation of Khosla SupCon ("all" mode)
        f = torch.from_numpy(feats)
        cat = torch.cat(torch.unbind(f, dim=1), dim=0)
        lab = torch.from_numpy(np.tile(labels, 2))
        logits = cat @ cat.T / 0.07
        logits = logits - logits.max(dim=1, keepdim=True).values
        logits_mask = 1 - torch.eye(8)
        mask = (lab[:, None] == lab[None, :]).float() * logits_mask
        exp_logits = logits.exp() * logits_mask
        log_prob = logits - exp_logits.sum(1, keepdim=True).log()
        mean_pos = (mask * log_prob).sum(1) / mask.sum(1)
        exp = (-mean_pos).mean().item()
        np.testing.assert_allclose(ours, exp, rtol=1e-4)


class TestOhemMinKeptZero:
    def test_min_kept_zero_is_plain_ce(self):
        """losser.py:34 gates ALL filtering on min_kept > 0."""
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(64, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, (64,)), jnp.int32)
        a = float(ohem_cross_entropy(logits.reshape(4, 4, 4, 5),
                                     labels.reshape(4, 4, 4), min_kept=0))
        b = float(cross_entropy(logits, labels))
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_min_kept_above_num_valid_is_plain_ce(self):
        """losser.py:28-29: filtering also skipped when min_kept > num_valid."""
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(2, 4, 4, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, (2, 4, 4)), jnp.int32)
        a = float(ohem_cross_entropy(logits, labels, min_kept=10_000))
        b = float(cross_entropy(logits, labels))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestPixelContrastParity:
    def _torch_contrastive(self, feats_, labels_, temperature):
        """Inline torch transcription of PixelContrastLoss._contrastive
        (contrastive.py:93-137): per-pair exp(logit)+neg-sum denominator."""
        anchor_num, n_view = feats_.shape[0], feats_.shape[1]
        labels_ = labels_.contiguous().view(-1, 1)
        mask = torch.eq(labels_, labels_.T).float()
        contrast = torch.cat(torch.unbind(feats_, dim=1), dim=0)
        logits = (contrast @ contrast.T) / temperature
        logits = logits - logits.max(dim=1, keepdim=True).values.detach()
        mask = mask.repeat(n_view, n_view)
        neg_mask = 1 - mask
        n = anchor_num * n_view
        logits_mask = torch.ones(n, n).scatter_(
            1, torch.arange(n).view(-1, 1), 0)
        mask = mask * logits_mask
        neg = (torch.exp(logits) * neg_mask).sum(1, keepdim=True)
        log_prob = logits - torch.log(torch.exp(logits) + neg)
        mean_lpp = (mask * log_prob).sum(1) / mask.sum(1)
        return float((-mean_lpp).mean())

    def test_core_matches_reference_denominator(self):
        """_pixelcontrast_core == reference _contrastive on fixed anchors
        (all slots valid)."""
        from cavp_tpu.losses.contrast_extra import _pixelcontrast_core

        torch.manual_seed(0)
        n_slots, n_view, d = 3, 4, 8
        x = torch.randn(n_slots, n_view, d)
        x = tF.normalize(x, p=2, dim=-1)
        y = torch.tensor([1.0, 2.0, 1.0])
        ref = self._torch_contrastive(x, y.clone(), 0.1)

        flat = jnp.concatenate(
            jnp.split(jnp.asarray(x.numpy()), n_view, axis=1), axis=0
        ).reshape(n_slots * n_view, d)
        valid = jnp.ones((n_slots,))
        vmask = jnp.tile(valid, n_view)
        same = (y.numpy()[:, None] == y.numpy()[None, :]).astype(np.float32)
        mask = jnp.asarray(np.tile(same, (n_view, n_view)))
        logits_mask = (1.0 - jnp.eye(n_slots * n_view))
        got = float(_pixelcontrast_core(flat, mask, logits_mask, 0.1,
                                        valid_rows=vmask, eps=1e-12))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_anchor_classes_come_from_gt(self):
        """Eligibility uses the GT histogram (contrastive.py:27-35), not
        the prediction's: classes dominant only in the prediction yield
        no anchors (loss exactly 0 — no eligible slots), while two
        GT-dominant classes yield a positive loss even when the model
        never predicts them."""
        from cavp_tpu.losses import pixel_contrast_loss

        b, h, w, c, k = 1, 8, 8, 6, 4
        feats = jnp.asarray(np.random.RandomState(0).randn(b, h, w, c)
                            .astype(np.float32))
        # prediction: two dominant classes (2 and 3, 32 px each > 16);
        # GT: all pixels class 1... but spread GT so NO class > 16? GT
        # must have nothing eligible: alternate GT over 4 classes
        # (16 px each, not > 16).
        pred = jnp.zeros((b, h, w, k)).at[:, :, :4, 2].set(10.0
                                                           ).at[:, :, 4:, 3].set(10.0)
        gt_spread = jnp.asarray(
            (np.indices((h, w)).sum(0) % 4).astype(np.int32))[None]
        loss_pred_only = float(pixel_contrast_loss(
            jax.random.PRNGKey(0), feats, pred, gt_spread, max_views=16,
            slots_per_image=2))
        assert loss_pred_only == 0.0  # old (prediction-based) gave > 0

        # GT: two dominant classes (1 on left half, 3 on right), while
        # the prediction stays on class 2 everywhere -> all-hard anchors
        pred2 = jnp.zeros((b, h, w, k)).at[..., 2].set(10.0)
        gt_two = jnp.asarray(np.where(np.arange(w)[None, :] < 4, 1, 3)
                             .astype(np.int32))[None].repeat(h, axis=0
                                                             ).reshape(b, h, w)
        loss_gt = float(pixel_contrast_loss(
            jax.random.PRNGKey(0), feats, pred2, gt_two, max_views=16,
            slots_per_image=2))
        assert np.isfinite(loss_gt) and loss_gt > 0.0


class TestCropAudioShortClips:
    def test_short_clip_keeps_tail_and_tiles(self):
        """audio_dataset.crop_audio:51-62 — negative start wraps from
        the END in python slicing; the reference tiles only the tail."""
        from cavp_tpu.data.audio_io import crop_audio

        wave = np.arange(12800, dtype=np.float32)[None]  # 0.8 s @ 16 kHz
        out = crop_audio(wave, 1.0)
        assert out.shape == (1, 16000)
        # st = 6400 - 8000 = -1600 -> wave[:, -1600:] = samples 11200..12799
        np.testing.assert_array_equal(out[0, :1600], wave[0, -1600:])
        np.testing.assert_array_equal(out[0, 1600:3200], wave[0, -1600:])
