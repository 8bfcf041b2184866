"""Tests for auxiliary subsystems: VGGish-128, localization evaluators,
meters, color-mask decoding, semi-sampling."""

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from cavp_tpu.data.avss import color_mask_to_label, get_v2_palette
from cavp_tpu.metrics.localization import Evaluator, EvaluatorFull
from cavp_tpu.models.vggish import VGGish
from cavp_tpu.utils.meters import AverageMeter, semi_sample, t_test


class TestVGGish:
    def test_embedding_shape(self):
        model = VGGish()
        x = jnp.zeros((2, 96, 64, 1))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (2, 128)

    def test_postprocessor_quantizes(self):
        model = VGGish(postprocess=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 64, 1))
        v = model.init(jax.random.PRNGKey(0), x)
        # set identity PCA so the quantization path is exercised
        import flax

        p = flax.core.unfreeze(v["params"])
        p["pproc"]["pca_eigen_vectors"] = jnp.eye(128)
        v = {"params": p}
        out = np.asarray(model.apply(v, x))
        assert out.min() >= 0 and out.max() <= 255
        np.testing.assert_array_equal(out, np.round(out))


class TestLocalizationEval:
    def test_ciou_and_auc(self):
        ev = Evaluator()
        gt = np.zeros((224, 224))
        gt[50:150, 50:150] = 1
        infer = np.zeros((224, 224))
        infer[50:150, 50:150] = 0.9
        ciou = ev.cal_CIOU([(50, 50, 150, 150)], 0.9, infer, gt)
        assert abs(ciou - 1.0) < 1e-6
        assert ev.finalize_AP50() == 1.0
        assert 0.9 < ev.finalize_AUC() <= 1.0

    def test_full_evaluator_stats(self):
        ev = EvaluatorFull()
        rng = np.random.RandomState(0)
        for i in range(50):
            ev.update(f"s{i}", area=40 ** 2, n_boxes=1,
                      ciou=float(rng.rand()), confidence=float(rng.rand()))
        stats = ev.finalize_stats()
        assert "Precision-all@50" in stats
        assert "AUC-visible@50" in stats
        assert np.isfinite(stats["AP-all@50"])


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0

    def test_t_test_signal(self):
        assert t_test([1, 1.1, 0.9], [0.1, 0.2, 0.0]) > 3

    def test_semi_sample(self):
        df = pd.DataFrame({"a_obj": ["a"] * 8 + ["b"] * 4,
                           "x": range(12)})
        out = semi_sample(df, "1/4")
        assert len(out[out.a_obj == "a"]) == 2
        assert len(out[out.a_obj == "b"]) == 1


class TestColorMask:
    def test_round_trip(self):
        pal = get_v2_palette(71)
        label = np.random.RandomState(0).randint(0, 71, (16, 16))
        rgb = np.asarray(pal, np.uint8).reshape(-1, 3)[label]
        back = color_mask_to_label(rgb, pal)
        np.testing.assert_array_equal(back, label)


class TestEvaluatorFullF1:
    def test_f1_keys_and_small_subset_ap(self):
        """finalize_stats must emit the F1-{subset}@{iou} sweep the
        reference's display_results reads (engine/utils.py:320-335), and
        tiny subsets give AP=0.0 (reference empty-range sum), not NaN."""
        ev = EvaluatorFull()
        rng = np.random.RandomState(0)
        for i in range(6):
            ev.update(name=f"v{i}", area=100 + i, n_boxes=1,
                      ciou=float(rng.rand()), confidence=float(rng.rand()))
        out = ev.finalize_stats()
        f1 = out.get("F1-all@50")
        assert isinstance(f1, list) and len(f1) >= 1
        assert all(np.isfinite(v) for v in f1)
        ap = out["AP-all@50"]
        assert np.isfinite(ap)
