"""Fused visual-fusion Pallas kernel vs the flax module composition.

The kernel (cavp_tpu/ops/pallas/fusion_kernel.py) runs the whole eval
fusion stage — visual_projector -> patch embeds -> depth-1 sigmoid-CA
block (rank-1 collapsed) -> final norm — in one pass. These tests pin
it numerically against ``CAVP.forward_fusion``'s module path (reference
semantics: cavp_model.py:143-154, attn.py:109-171) in f32 on CPU
(interpreter mode), including the non-divisor token-count padding path,
and the eval-forward wiring behind ``config.use_pallas_fusion``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cavp_tpu.models.attn import CrossAttention
from cavp_tpu.models.layers import Mlp
from cavp_tpu.ops.pallas.fusion_kernel import fused_visual_fusion

# tolerance: the kernel's rational-erf GELU is within 1.5e-7 of exact
# erf; amplified through fc2/mlp sums this reaches a few e-5 in f32.
TOL = dict(rtol=1e-4, atol=5e-5)


class FusionSlice(nn.Module):
    """Exactly CAVP.forward_fusion's module chain at dup=1."""

    latent: int = 304

    def setup(self):
        self.cross_att = CrossAttention(embed_dim=self.latent, depth=1,
                                        num_heads=4)
        self.visual_projector = Mlp(hidden_features=256,
                                    out_features=self.latent)

    def __call__(self, fea_v, fea_a):
        B, h, w, C = fea_v.shape
        tokens = self.visual_projector(fea_v.reshape(B, h * w, C))
        fused, _, _ = self.cross_att(tokens.reshape(B, h, w, C),
                                     fea_a.reshape(B, 1, 1, C))
        return fused


class TestFusedVisualFusion:
    @pytest.mark.parametrize("hw", [(8, 8), (7, 9)])  # divisor / padded
    def test_matches_module_chain(self, hw):
        h, w = hw
        B, C = 2, 304
        fea_v = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, C))
        fea_a = jax.random.normal(jax.random.PRNGKey(1), (B, C))
        mod = FusionSlice()
        params = mod.init(jax.random.PRNGKey(2), fea_v, fea_a)
        ref = mod.apply(params, fea_v, fea_a)
        got = fused_visual_fusion(params["params"], fea_v, fea_a,
                                  interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)

    def test_under_jit(self):
        B, h, w, C = 1, 8, 8, 304
        fea_v = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, C))
        fea_a = jax.random.normal(jax.random.PRNGKey(1), (B, C))
        mod = FusionSlice()
        params = mod.init(jax.random.PRNGKey(2), fea_v, fea_a)
        ref = mod.apply(params, fea_v, fea_a)
        got = jax.jit(lambda p, v, a: fused_visual_fusion(p, v, a,
                                                          interpret=True))(
            params["params"], fea_v, fea_a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


class TestEvalForwardWiring:
    def test_inference_forward_flag_equivalence(self):
        """make_inference_forward(use_pallas_fusion=True) must produce
        the same logits as the plain eval_mode apply."""
        from cavp_tpu.config import get_config
        from cavp_tpu.engine.loops import make_inference_forward
        from cavp_tpu.engine.runner import build_model

        config = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            visual_backbone=18, compute_dtype="float32")
        model = build_model(config)
        rng = jax.random.PRNGKey(0)
        image = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        audio = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 64, 1))
        variables = model.init(rng, image, audio, eval_mode=True)

        plain = make_inference_forward(model, config)
        fused = make_inference_forward(
            model, config.replace(use_pallas_fusion=True))
        ref = plain(variables, image, audio)
        got = fused(variables, image, audio)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestUpsampleArgmax:
    """Fused bilinear-upsample+argmax kernel: bitwise-equal pred."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("shape", [(14, 14, 56, 56), (56, 56, 224, 224)])
    def test_bitwise_vs_module_path(self, dtype, shape):
        from cavp_tpu.ops.interp import interpolate_bilinear
        from cavp_tpu.ops.pallas.upsample_argmax_kernel import upsample_argmax

        h, w, H, W = shape
        B, C = 2, 71
        logits = jax.random.normal(jax.random.PRNGKey(0),
                                   (B, h, w, C)).astype(dtype)
        ref = jnp.argmax(
            interpolate_bilinear(logits, (H, W), align_corners=False),
            axis=-1).astype(jnp.int32)
        got = upsample_argmax(logits, (H, W), interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("use_argmax_kernel", [False, True])
    def test_eval_step_metrics_identical(self, use_argmax_kernel):
        """Full eval step with use_pallas_fusion on vs off (and
        optionally the upsample+argmax kernel): pred is bitwise-equal
        modulo the fusion kernel's f32-level deviations, so on a
        margin-separated synthetic batch the metric counters must match
        exactly."""
        from cavp_tpu.config import get_config
        from cavp_tpu.data.synthetic import synthetic_eval_batch
        from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
        from cavp_tpu.engine.runner import build_model

        config = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            visual_backbone=18, compute_dtype="float32")
        model = build_model(config)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_eval_batch(config, 4).items()}
        image = batch["image"]
        variables = model.init(jax.random.PRNGKey(0), image[:1],
                               jnp.zeros((1, 96, 64, 1)), eval_mode=True)

        m0 = eval_metrics_init(config.num_classes)
        off = make_eval_step(model, config)(variables, m0, batch)
        on = make_eval_step(
            model, config.replace(use_pallas_fusion=True,
                                  use_pallas_argmax=use_argmax_kernel))(
            variables, m0, batch)
        for name in ("miou_all", "miou_ms"):
            a, b = getattr(off, name), getattr(on, name)
            np.testing.assert_allclose(np.asarray(a.inter),
                                       np.asarray(b.inter), atol=2)
            np.testing.assert_allclose(np.asarray(a.union),
                                       np.asarray(b.union), atol=2)
        np.testing.assert_allclose(np.asarray(off.fg_all),
                                   np.asarray(on.fg_all), atol=2)
