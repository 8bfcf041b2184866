"""Fused layer1 residual-stage Pallas kernel vs the flax module path.

The kernel (cavp_tpu/ops/pallas/layer1_kernel.py) runs the whole layer1
stage — every Bottleneck block (reference
models/visual/backbones/resnet.py:53-98; rebuilt in
cavp_tpu/models/resnet.py) — in one VMEM pass per image. These tests
pin it numerically against chaining the flax blocks at eval (f32 on the
CPU interpreter), including the resnet18 2-block variant and the
eval-forward wiring behind ``config.use_pallas_layer1``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavp_tpu.models.resnet import ResNet
from cavp_tpu.ops.pallas.layer1_kernel import fused_layer1, layer1_fits

# the kernel applies eval-BN as a folded affine on the f32 accumulator
# (module path rounds the conv output to the activation dtype first);
# through three blocks this stays at the 1e-6 level in f32.
TOL = dict(rtol=1e-5, atol=1e-5)


def _init_with_stats(depth, img_hw, seed=0):
    """Init a deep-stem ResNet and jitter params + BN running stats so
    the folded-affine path is actually exercised (fresh stats are
    mean=0/var=1, which would make BN a no-op-ish affine)."""
    m = ResNet(depth=depth, replace_stride_with_dilation=(False, True, True))
    img = jax.random.normal(jax.random.PRNGKey(seed), (2, *img_hw, 3))
    v = m.init(jax.random.PRNGKey(seed + 1), img, False)
    keys = iter(jax.random.split(jax.random.PRNGKey(seed + 2), 4096))
    jitter = lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape)
    stats = jax.tree.map(lambda a: jnp.maximum(jitter(a), 0.05),
                         v["batch_stats"])
    params = jax.tree.map(jitter, v["params"])
    return m, {"params": params, "batch_stats": stats}, img


def _module_c1(m, variables, stem):
    def f(mod, s):
        x = s
        for blk in mod.layer1:
            x = blk(x, False)
        return x
    return m.apply(variables, stem, method=f)


class TestFusedLayer1:
    @pytest.mark.parametrize("depth", [50, 18])  # 3 blocks / 2 blocks
    def test_matches_module_chain(self, depth):
        m, variables, img = _init_with_stats(depth, (64, 64))
        stem = m.apply(variables, img, False, method=ResNet.stem_forward)
        ref = _module_c1(m, variables, stem)
        got = fused_layer1(variables["params"], variables["batch_stats"],
                           stem, interpret=True)
        assert got.shape == ref.shape
        assert float(jnp.max(jnp.abs(ref))) > 0  # non-degenerate fixture
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)

    def test_under_jit_bf16(self):
        m, variables, img = _init_with_stats(50, (64, 64), seed=7)
        stem = m.apply(variables, img, False,
                       method=ResNet.stem_forward).astype(jnp.bfloat16)
        ref = _module_c1(m, variables, stem).astype(jnp.float32)
        got = jax.jit(lambda p, s, x: fused_layer1(p, s, x, interpret=True))(
            variables["params"], variables["batch_stats"], stem
        ).astype(jnp.float32)
        # bf16: the kernel's f32-affine-then-round vs the module's
        # round-then-bf16-affine differ at the rounding level only
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 0.02 * max(scale, 1.0)

    def test_vmem_gate(self):
        assert layer1_fits(56, 56)
        # Above the measured 56x56 shape the unrolled chain's Mosaic
        # stack (~17 MB there) would exceed the declared 20 MB limit.
        assert not layer1_fits(96, 96)
        assert not layer1_fits(128, 128)


class TestEvalForwardWiring:
    def test_inference_forward_flag_equivalence(self):
        """make_inference_forward(use_pallas_layer1=True) must produce
        the same logits as the plain eval_mode apply — alone and
        stacked with use_pallas_fusion."""
        from cavp_tpu.config import get_config
        from cavp_tpu.engine.loops import make_inference_forward
        from cavp_tpu.engine.runner import build_model

        config = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            visual_backbone=18, compute_dtype="float32")
        model = build_model(config)
        image = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        audio = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 64, 1))
        variables = model.init(jax.random.PRNGKey(0), image, audio,
                               eval_mode=True)

        ref = make_inference_forward(model, config)(variables, image, audio)
        for flags in (dict(use_pallas_layer1=True),
                      dict(use_pallas_layer1=True, use_pallas_fusion=True)):
            got = make_inference_forward(model, config.replace(**flags))(
                variables, image, audio)
            assert got.shape == ref.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
