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
