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
