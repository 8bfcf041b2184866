"""Metric unit tests vs independent numpy/torch formulations
(SURVEY.md §4c)."""

import numpy as np
import jax.numpy as jnp

from cavp_tpu.metrics import (
    color_miou_fscore,
    eval_fmeasure,
    fg_init,
    fg_result,
    fg_update,
    mask_iou,
    miou_init,
    miou_result,
    miou_update,
)


def _rand_case(seed, n_classes=5, hw=16):
    rng = np.random.RandomState(seed)
    logits = rng.randn(2, hw, hw, n_classes).astype(np.float32)
    target = rng.randint(0, n_classes, size=(2, hw, hw))
    target[0, :2, :2] = 255  # some ignored pixels
    return logits, target


class TestMIoU:
    def test_against_numpy(self):
        n_classes = 5
        logits, target = _rand_case(0, n_classes)
        state = miou_init(n_classes)
        state = miou_update(state, jnp.asarray(logits), jnp.asarray(target))
        miou, acc = miou_result(state)

        # independent: +1 shift, ignore -> 0 after shift
        pred = logits.argmax(-1) + 1
        tgt = np.where(target == 255, -1, target) + 1
        labeled = (tgt > 0).sum()
        correct = ((pred == tgt) & (tgt > 0)).sum()
        predm = pred * (tgt > 0)
        inter_img = predm * (predm == tgt)
        eps = np.spacing(1)
        ious = []
        inter_c = np.zeros(n_classes)
        union_c = np.zeros(n_classes)
        for c in range(1, n_classes + 1):
            it = (inter_img == c).sum()
            un = (predm == c).sum() + (tgt == c).sum() - it
            inter_c[c - 1], union_c[c - 1] = it, un
        exp_iou = (inter_c / (eps + union_c)).mean()
        np.testing.assert_allclose(float(miou), exp_iou, rtol=1e-5)
        np.testing.assert_allclose(float(acc), correct / (eps + labeled), rtol=1e-5)

    def test_weighted_frames_ignored(self):
        n_classes = 4
        rng = np.random.RandomState(1)
        logits = rng.randn(3, 8, 8, n_classes).astype(np.float32)
        target = rng.randint(0, n_classes, size=(3, 8, 8))
        w = jnp.asarray([1.0, 0.0, 1.0])
        s_w = miou_update(miou_init(n_classes), jnp.asarray(logits),
                          jnp.asarray(target), weight=w)
        s_2 = miou_update(miou_init(n_classes), jnp.asarray(logits[[0, 2]]),
                          jnp.asarray(target[[0, 2]]))
        np.testing.assert_allclose(np.asarray(s_w.inter), np.asarray(s_2.inter))
        np.testing.assert_allclose(np.asarray(s_w.union), np.asarray(s_2.union))


class TestFgDetect:
    def test_confusion_and_scores(self):
        n = 4
        logits, target = _rand_case(3, n, hw=8)
        conf = fg_update(fg_init(n), jnp.asarray(logits), jnp.asarray(target))
        pred = logits.argmax(-1)
        mask = (target >= 0) & (target < n) & (target != 255)
        exp = np.bincount(
            n * target[mask].astype(int) + pred[mask], minlength=n * n
        ).reshape(n, n)
        np.testing.assert_array_equal(np.asarray(conf), exp)

        fdr, f1, f03 = fg_result(conf)
        tp = np.diag(exp).astype(float)
        fp = exp.sum(0) - tp
        fn = exp.sum(1) - tp
        with np.errstate(invalid="ignore"):
            np.testing.assert_allclose(
                float(fdr), np.nanmean(fp / (fp + tp)), rtol=1e-6)
            np.testing.assert_allclose(
                float(f1), np.nanmean(2 * tp / (2 * tp + fn + fp)), rtol=1e-6)

    def test_absent_classes_nanmean_semantics(self):
        """Classes with no predictions AND no labels are excluded from the
        means (reference nanmean over present classes)."""
        conf = np.zeros((4, 4), np.float32)
        conf[1, 1] = 10  # one perfectly-predicted present class
        conf[2, 1] = 2   # class-2 labels predicted as 1
        fdr, f1, f03 = fg_result(jnp.asarray(conf))
        # fdr over classes with tp+fp>0: only class 1 -> 2/12
        np.testing.assert_allclose(float(fdr), 2 / 12, rtol=1e-6)
        assert np.isfinite(float(f1)) and np.isfinite(float(f03))

    def test_result_under_debug_nans_guard(self):
        """--debug turns on jax_debug_nans (engine/runner.py) as the
        nan-guard; the result math must not trip it on absent classes.
        Regression for the round-5 CLI find: the old nan-sentinel
        nanmean crashed any eval where some class never appeared."""
        import jax

        conf = np.zeros((6, 6), np.float32)
        conf[1, 1] = 5   # most classes absent
        jax.config.update("jax_debug_nans", True)
        try:
            fdr, f1, f03 = fg_result(jnp.asarray(conf))
            assert np.isfinite(float(fdr))
        finally:
            jax.config.update("jax_debug_nans", False)


class TestMaskIoU:
    def test_against_numpy(self):
        rng = np.random.RandomState(0)
        pred = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
        tgt = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
        tgt[2] = 0  # empty-GT frame
        got = float(mask_iou(jnp.asarray(pred), jnp.asarray(tgt)))
        inter = (pred * tgt).sum((1, 2))
        union = np.maximum(pred, tgt).sum((1, 2))
        inter[2] = ((1 - tgt[2]) * (1 - pred[2])).sum()
        union[2] = 16 * 16
        exp = (inter / (union + 1e-7)).mean()
        np.testing.assert_allclose(got, exp, rtol=1e-6)


class TestFmeasure:
    def test_against_threshold_loop(self):
        rng = np.random.RandomState(2)
        pred = rng.rand(3, 12, 12).astype(np.float32)
        gt = (rng.rand(3, 12, 12) > 0.6).astype(np.float32)
        gt[1] = 0  # skipped frame
        got = float(eval_fmeasure(jnp.asarray(pred), jnp.asarray(gt)))

        # independent O(255*HW) loop
        th = np.linspace(0, 1 - 1e-10, 255)
        beta2 = 0.3
        avg_f, img_num = 0.0, 0
        for i in range(3):
            if gt[i].mean() == 0:
                continue
            prec = np.zeros(255)
            rec = np.zeros(255)
            for k, t in enumerate(th):
                yt = (pred[i] >= t).astype(np.float32)
                tp = (yt * gt[i]).sum()
                prec[k] = tp / (yt.sum() + 1e-20)
                rec[k] = tp / (gt[i].sum() + 1e-20)
            f = (1 + beta2) * prec * rec / (beta2 * prec + rec)
            f[np.isnan(f)] = 0
            avg_f = avg_f + f
            img_num += 1
        exp = (avg_f / img_num).max()
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


class TestColorMiouFscore:
    def test_against_numpy(self):
        n = 4
        rng = np.random.RandomState(4)
        logits = rng.randn(3, 8, 8, n).astype(np.float32)
        target = rng.randint(0, n, (3, 8, 8))
        ious, fscores, counts = color_miou_fscore(
            jnp.asarray(logits), jnp.asarray(target))

        pred = logits.argmax(-1) + 1
        tgt = target + 1.0
        predm = pred * (tgt > 0)
        inter = predm * (predm == tgt)
        exp_iou = np.zeros(n)
        exp_f = np.zeros(n)
        exp_c = np.zeros(n)
        for i in range(3):
            ai = np.array([(inter[i] == c).sum() for c in range(1, n + 1)], float)
            ap = np.array([(predm[i] == c).sum() for c in range(1, n + 1)], float)
            al = np.array([(tgt[i] == c).sum() for c in range(1, n + 1)], float)
            au = ap + al - ai
            exp_iou += ai / (2.220446049250313e-16 + au)
            exp_c += (au > 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                p = ai / ap
                r = ai / al
                f = 1.3 * p * r / (0.3 * p + r)
            f[np.isnan(f)] = 0
            exp_f += f
        np.testing.assert_allclose(np.asarray(ious), exp_iou, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fscores), exp_f, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(counts), exp_c)
