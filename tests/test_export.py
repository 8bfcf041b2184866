"""AOT export round trip: serialized StableHLO predict artifact
reproduces the live model's masks, loaded without model code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.engine.export import (ExportedPredictor, export_predict,
                                    _predict_fn)
from cavp_tpu.models.cavp import CAVP


class TestExport:
    def test_round_trip_matches_live(self, tmp_path):
        cfg = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=7,
            visual_backbone=18, compute_dtype="float32")
        model = CAVP(num_classes=7, visual_backbone=18)
        rng = np.random.RandomState(0)
        img_u8 = rng.randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
        wav = (rng.rand(1, 1, 16000).astype(np.float32) - 0.5) * 0.2
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((1, 96, 64, 1), jnp.float32), True)

        out = export_predict(model, variables, cfg, str(tmp_path / "art"),
                             batch_size=1, image_hw=(64, 64))

        live_mask, live_conf = jax.jit(
            lambda v, i, w: _predict_fn(model, cfg)(v, i, w)
        )(variables, jnp.asarray(img_u8), jnp.asarray(wav))

        served = ExportedPredictor(out)
        mask, conf = served(img_u8, wav)
        np.testing.assert_array_equal(mask, np.asarray(live_mask))
        np.testing.assert_allclose(conf, np.asarray(live_conf),
                                   rtol=1e-5, atol=1e-6)
        assert served.meta["num_classes"] == 7

    def test_artifact_is_self_contained(self, tmp_path):
        """Deserialization must not need the flax module registry: load
        in a fresh namespace using only the artifact files."""
        import os
        cfg = get_config("avss").replace(
            image_width=32, image_height=32, num_classes=3,
            visual_backbone=18, compute_dtype="float32")
        model = CAVP(num_classes=3, visual_backbone=18)
        variables = model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            jnp.zeros((1, 96, 64, 1), jnp.float32), True)
        out = export_predict(model, variables, cfg, str(tmp_path / "a2"),
                             batch_size=2, image_hw=(32, 32))
        assert sorted(os.listdir(out)) == ["meta.json", "predict.stablehlo"]
        p = ExportedPredictor(out)
        mask, conf = p(np.zeros((2, 32, 32, 3), np.uint8),
                       np.zeros((2, 1, 16000), np.float32))
        assert mask.shape == (2, 32, 32) and conf.shape == (2, 32, 32)


class TestExportedServing:
    """The artifact is directly servable: Predictor-compatible surface
    (predict/expected_shapes/warmup/batch_sizes) drives the dynamic
    batcher exactly like the live Predictor (serve.py --artifact)."""

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        cfg = get_config("avss").replace(
            image_width=32, image_height=32, num_classes=3,
            visual_backbone=18, compute_dtype="float32")
        model = CAVP(num_classes=3, visual_backbone=18)
        variables = model.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            jnp.zeros((1, 96, 64, 1), jnp.float32), True)
        out = tmp_path_factory.mktemp("srv") / "art"
        export_predict(model, variables, cfg, str(out), batch_size=2,
                       image_hw=(32, 32))
        return str(out)

    def test_predict_surface_chunks_and_validates(self, artifact):
        p = ExportedPredictor(artifact).warmup()
        assert p.batch_sizes == [2]
        img_s, wav_s = p.expected_shapes()
        assert img_s == (32, 32, 3) and wav_s == (1, 16000)
        out = p.predict(np.zeros((5,) + img_s, np.uint8),
                        np.zeros((5,) + wav_s, np.float32))
        assert out["mask"].shape == (5, 32, 32)
        assert out["conf"].shape == (5, 32, 32)
        with pytest.raises(ValueError):
            p.predict(np.zeros((1, 16, 16, 3), np.uint8),
                      np.zeros((1,) + wav_s, np.float32))

    def test_dynamic_batcher_over_artifact(self, artifact):
        from cavp_tpu.engine.server import DynamicBatcher

        p = ExportedPredictor(artifact).warmup()
        b = DynamicBatcher(p.predict, max_batch=p.batch_sizes[0],
                           max_wait_ms=20.0,
                           expected_shapes=p.expected_shapes())
        futs = [b.submit(np.zeros((1, 32, 32, 3), np.uint8),
                         np.zeros((1, 1, 16000), np.float32))
                for _ in range(3)]
        outs = [f.result(timeout=30) for f in futs]
        b.close()
        assert all(o["mask"].shape == (1, 32, 32) for o in outs)
