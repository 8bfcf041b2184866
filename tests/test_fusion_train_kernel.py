"""Train-path fused fusion Pallas kernel vs the flax module path.

The kernel (cavp_tpu/ops/pallas/fusion_train_kernel.py) runs the whole
live train fusion chain at dup=2 — projector -> patch_embed_v -> norm1
-> rank-1 sigmoid gate -> +res -> norm2 -> Mlp -> +res -> final norm —
as a forward Pallas kernel plus a full-recompute backward kernel wired
as a ``jax.custom_vjp``. These tests pin BOTH directions numerically
against ``CrossAttention``'s module composition at dup=2 (reference
semantics: attn.py:109-171, cavp_model.py:143-154,175-188) in f32 on
CPU (interpreter mode), including the non-divisor token-count padding
path whose zero-cotangent pad rows must contribute nothing to any
gradient accumulator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cavp_tpu.models.attn import CrossAttention
from cavp_tpu.models.layers import Mlp
from cavp_tpu.ops.pallas.fusion_train_kernel import fusion_train

# same tolerance story as the eval kernel (rational-erf GELU |err| <=
# 1.5e-7 amplified through the mlp sums); gradients additionally pass
# through the recompute so they see the deviation twice.
FWD_TOL = dict(rtol=1e-4, atol=5e-5)
GRAD_RTOL = 1e-4


class TrainFusionSlice(nn.Module):
    """Exactly CAVP.forward_fusion's module chain at dup=2
    (cavp.py:163-182): one shared visual batch, matched ‖ shuffled
    audio features."""

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
                                     fea_a.reshape(2 * B, 1, 1, C), dup=2)
        return fused  # [2B, h*w, C]


def _setup(hw=(8, 8), B=2, C=304):
    h, w = hw
    fea_v = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, C))
    fea_a = jax.random.normal(jax.random.PRNGKey(2), (2 * B, C))
    mod = TrainFusionSlice(latent=C)
    params = mod.init(jax.random.PRNGKey(0), fea_v, fea_a)
    return mod, params, fea_v, fea_a


class TestFusionTrainForward:
    @pytest.mark.parametrize("hw", [(8, 8), (7, 9)])  # divisor / padded
    def test_matches_module_chain(self, hw):
        mod, params, fea_v, fea_a = _setup(hw)
        ref = mod.apply(params, fea_v, fea_a)
        got = fusion_train(params["params"], fea_v, fea_a, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   **FWD_TOL)

    def test_under_jit(self):
        mod, params, fea_v, fea_a = _setup()
        ref = mod.apply(params, fea_v, fea_a)
        got = jax.jit(lambda p, v, a: fusion_train(p, v, a,
                                                   interpret=True))(
            params["params"], fea_v, fea_a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   **FWD_TOL)


class TestFusionTrainGrad:
    """The hand-written Pallas VJP vs jax.grad of the module path —
    every parameter (projector, patch embeds, norms, q/k/v/proj, mlp)
    plus both inputs, through a random-weighted scalar loss over BOTH
    dup halves (so matched and shuffled cotangents differ)."""

    @pytest.mark.parametrize("hw", [(8, 8), (7, 9)])  # divisor / padded
    def test_full_vjp_matches_ad(self, hw):
        mod, params, fea_v, fea_a = _setup(hw)
        wsum = jax.random.normal(jax.random.PRNGKey(3),
                                 mod.apply(params, fea_v, fea_a).shape)

        def loss_ref(p, v, a):
            return jnp.sum(mod.apply(p, v, a) * wsum)

        def loss_ker(p, v, a):
            return jnp.sum(fusion_train(p["params"], v, a,
                                        interpret=True) * wsum)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, fea_v, fea_a)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(params, fea_v, fea_a)
        flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
        flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
        assert len(flat_r) == len(flat_k)
        for (path, vr), (_, vk) in zip(flat_r, flat_k):
            scale = float(np.max(np.abs(np.asarray(vr)))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(vk), np.asarray(vr),
                rtol=0, atol=GRAD_RTOL * scale,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    def test_unused_params_zero_grad(self):
        """Positional embeddings (allocated-but-unused, attn.py:235-238)
        and the audio-side q/k/v of the dead second attention must get
        exact zero gradients through the kernel path, as AD gives them
        through the module path."""
        mod, params, fea_v, fea_a = _setup()

        def loss_ker(p):
            return jnp.sum(fusion_train(p["params"], fea_v, fea_a,
                                        interpret=True) ** 2)

        g = jax.grad(loss_ker)(params)["params"]
        ca = g["cross_att"]
        assert float(jnp.abs(ca["pos_embed_v"]).max()) == 0.0
        assert float(jnp.abs(ca["pos_embed_a"]).max()) == 0.0


class TestTrainStepWiring:
    """Full avss train step with ``use_pallas_fusion_train`` on vs off:
    same loss / batch stats / updated params up to the kernel's
    f32-rounding deviations (rational-erf GELU, different matmul
    blocking — NOT bitwise, unlike the pure-reassociation dedups)."""

    def test_step_equivalence(self):
        import optax

        from cavp_tpu.config import get_config
        from cavp_tpu.engine.loops import make_train_step
        from cavp_tpu.engine.state import create_train_state
        from cavp_tpu.models import CAVP

        cfg = get_config("avss").replace(
            num_classes=5, batch_size=4, image_width=64, image_height=64,
            max_view=8, class_slots=3, epochs=2, compute_dtype="float32",
            lr=1e-2)
        model = CAVP(num_classes=cfg.num_classes, visual_backbone=18,
                     audio_backbone="vgg")
        # Plain SGD, not make_optimizer: the production audio group is
        # Adam, whose single-step update is ~lr*sign(grad) — a 1e-4
        # relative grad deviation (the kernel's GELU approximation) on a
        # near-zero grad element flips the normalized magnitude by
        # percents. With SGD the update comparison is exactly
        # grad-relative; optimizer-composition is covered elsewhere.
        tx = optax.sgd(cfg.lr)
        rng = np.random.RandomState(0)
        B = cfg.batch_size
        img_label = np.zeros((B, cfg.num_classes), np.int32)
        img_label[:, 0] = 1
        for i in range(B):
            img_label[i, 1 + i % (cfg.num_classes - 1)] = 1
        batch = {
            "image": jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)),
            "waveform": jnp.asarray(
                rng.rand(B, 1, cfg.audio_samples).astype(np.float32) - 0.5),
            "pix_label": jnp.asarray(
                rng.randint(0, cfg.num_classes, (B, 64, 64)).astype(np.int32)),
            "img_label": jnp.asarray(img_label),
        }
        sample = {"image": batch["image"][:1],
                  "audio": jnp.zeros((1, 96, 64, 1))}
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   sample, cfg)

        def run(c):
            step = jax.jit(make_train_step(model, tx, c, variant="avss"))
            new_state, metrics = step(state, batch, jax.random.PRNGKey(3),
                                      jnp.asarray(1))
            return jax.device_get((new_state.params, new_state.batch_stats,
                                   metrics))

        p_off, bs_off, m_off = run(cfg)
        p_on, bs_on, m_on = run(cfg.replace(use_pallas_fusion_train=True))

        np.testing.assert_allclose(float(m_on["loss/loss"]),
                                   float(m_off["loss/loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(m_on["loss/l_ctr_av"]),
                                   float(m_off["loss/l_ctr_av"]),
                                   rtol=5e-3, atol=1e-5)
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(bs_on),
                jax.tree_util.tree_leaves(bs_off)):
            scale = float(np.max(np.abs(b))) + 1e-12
            np.testing.assert_allclose(
                a, b, rtol=0, atol=5e-5 * scale,
                err_msg=f"batch_stats at {jax.tree_util.keystr(path)}")
        # structure must be identical (the decomposed path threads the
        # full batch_stats collection through its three applies)
        assert (jax.tree_util.tree_structure(bs_on)
                == jax.tree_util.tree_structure(bs_off))
        # Compare param UPDATES scaled by the update magnitude (not the
        # param magnitude): the kernel's grads agree with AD to ~1.4e-4
        # relative (rational-erf GELU + reassociation), and near-zero
        # grads on near-zero params would otherwise blow the ratio.
        p0 = jax.device_get(state.params)
        for (path, a), b, c in zip(
                jax.tree_util.tree_leaves_with_path(p_on),
                jax.tree_util.tree_leaves(p_off),
                jax.tree_util.tree_leaves(p0)):
            da, db = (np.asarray(a) - np.asarray(c),
                      np.asarray(b) - np.asarray(c))
            # This test guards the step WIRING (a mis-wired tensor /
            # missing grad / stale stats is orders of magnitude off);
            # the kernel VJP's numerical exactness vs AD is pinned at
            # 1e-4 per-tensor above. Per-element gates chase the long
            # tail of cancellation-dominated tiny elements (BN biases,
            # near-zero conv taps) where GELU-approximation noise is
            # relatively larger — so gate on the tensor-level relative
            # L2 of the update difference plus a loose per-element cap.
            name = jax.tree_util.keystr(path)
            l2 = float(np.linalg.norm(da - db))
            ref = float(np.linalg.norm(db)) + 1e-12
            assert l2 <= 2e-3 * ref, \
                f"update L2 diff {l2:.3e} > 2e-3*{ref:.3e} at {name}"
            cap = 0.1 * float(np.max(np.abs(db))) + 1e-12
            worst = float(np.max(np.abs(da - db)))
            assert worst <= cap, \
                f"update max diff {worst:.3e} > {cap:.3e} at {name}"
