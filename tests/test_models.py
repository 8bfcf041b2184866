"""Shape/semantics tests for the flax model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavp_tpu.models import CAVP, ResNet, VisualModel
from cavp_tpu.models.audio_nets import AudioModel
from cavp_tpu.models.resnet import stage_specs


class TestStageSpecs:
    def test_avss_default_schedule(self):
        """[F,F,F] + layer4 surgery: strides /4,/8,/16,/16 with layer4
        3x3 dilations [2,4,8] and stride-1 downsample (encoder_decoder.py:40-55)."""
        specs = stage_specs((3, 4, 6, 3), (False, False, False))
        assert [s[0]["stride"] for s in specs] == [1, 2, 2, 1]
        assert [b["dilation"] for b in specs[3]] == [2, 4, 8]
        assert specs[3][0]["downsample"] == 1
        assert specs[0][0]["downsample"] == 1  # channel-change downsample
        assert all(b["dilation"] == 1 for s in specs[:3] for b in s)

    def test_vpo_dilated_schedule(self):
        """[F,T,T]: layer3/4 stride->dilation; surgery still forces
        layer4 3x3 dilations to [2,4,8]."""
        specs = stage_specs((3, 4, 23, 3), (False, True, True))
        assert [s[0]["stride"] for s in specs] == [1, 2, 1, 1]
        # layer3: block0 keeps previous dilation 1, rest get 2
        assert [b["dilation"] for b in specs[2][:3]] == [1, 2, 2]
        assert [b["dilation"] for b in specs[3]] == [2, 4, 8]


class TestResNet:
    def test_feature_strides(self):
        model = ResNet(depth=18)  # Bottleneck [2,2,2,2] per reference
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        feats = model.apply(variables, x, train=False)
        assert [f.shape[1] for f in feats] == [16, 8, 4, 4]
        assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


class TestCAVP:
    @pytest.fixture(scope="class")
    def small_cavp(self):
        model = CAVP(num_classes=7, visual_backbone=18)
        image = jnp.zeros((1, 64, 64, 3))
        audio = jnp.zeros((1, 96, 64, 1))
        variables = model.init(jax.random.PRNGKey(0), image, audio)
        return model, variables

    def test_inference_shapes(self, small_cavp):
        model, variables = small_cavp
        image = jnp.zeros((2, 64, 64, 3))
        audio = jnp.zeros((2, 96, 64, 1))
        logits, fused, pack = model.apply(variables, image, audio,
                                          eval_mode=True)
        assert logits.shape == (2, 64, 64, 7)
        assert fused.shape == (2, 16, 16, 112)
        assert pack["audio"].shape == (2, 112)
        assert pack["visual"].shape == (2, 16, 16, 112)
        # sigmoid attention: weights in (0, 1), not normalized
        attn = np.asarray(pack["attn_v"])
        assert attn.shape == (2, 4, 256, 1)
        assert (attn > 0).all() and (attn < 1).all()

    def test_train_duplicates_batch(self, small_cavp):
        model, variables = small_cavp
        image = jnp.zeros((2, 64, 64, 3))
        audio2b = jnp.zeros((4, 96, 64, 1))
        (logits, fused, pack), mutated = model.apply(
            variables, image, audio2b, eval_mode=False,
            mutable=["batch_stats"])
        # fused (the CoroCL input) carries matched ‖ shuffled [2B];
        # logits only the matched half (cls_matched_only default — the
        # shuffled half's head output has exactly zero gradient in the
        # reference, trainer_cavp_avss_image.py:204)
        assert logits.shape == (2, 64, 64, 7)
        assert fused.shape == (4, 16, 16, 112)
        assert "batch_stats" in mutated

    def test_train_full_head_variant(self, small_cavp):
        """cls_matched_only=False restores the reference's 2B head."""
        from cavp_tpu.models import CAVP

        model, variables = small_cavp
        ref_model = CAVP(num_classes=7, seg_model="DeepLabV3Plus",
                         visual_backbone=18, cls_matched_only=False)
        (logits, fused, _), _ = ref_model.apply(
            variables, jnp.zeros((2, 64, 64, 3)),
            jnp.zeros((4, 96, 64, 1)), eval_mode=False,
            mutable=["batch_stats"])
        assert logits.shape == (4, 64, 64, 7)
        assert fused.shape == (4, 16, 16, 112)

    def test_batchnorm_running_stats_update(self, small_cavp):
        model, variables = small_cavp
        image = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        audio2b = jax.random.normal(jax.random.PRNGKey(2), (4, 96, 64, 1))
        _, mutated = model.apply(variables, image, audio2b, eval_mode=False,
                                 mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after))
        assert changed


class TestAudioResNet:
    def test_stereo_tower(self):
        model = AudioModel(backbone="18", out_plane=304, in_plane=2)
        x = jnp.zeros((2, 300, 64, 2))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 304)


class TestVisualBaseline:
    def test_logits_shape(self):
        model = VisualModel(num_classes=3, visual_backbone=18)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, fea, pack = model.apply(variables, x)
        assert logits.shape == (1, 64, 64, 3)
        assert fea.shape[-1] == 112  # aspp64 + 48 for the r18 backbone
        assert pack == {}


class TestRank1AttentionCollapse:
    """The sigmoid attention's rank-1 collapse (attn.py Attention,
    ``collapse_rank1``) must match the reference q/proj-matmul path
    exactly up to f32 reassociation, forward and backward, for both the
    eval (dup=1) and train (dup=2) shapes."""

    def _modules(self):
        from cavp_tpu.models.attn import Attention
        fast = Attention(dim=304, num_heads=4, collapse_rank1=True)
        ref = Attention(dim=304, num_heads=4, collapse_rank1=False)
        return fast, ref

    @pytest.mark.parametrize("dup", [1, 2])
    def test_forward_equivalence(self, dup):
        fast, ref = self._modules()
        B, N, C = 3, 29, 304
        xq = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
        xk = jax.random.normal(jax.random.PRNGKey(1), (dup * B, 1, C))
        params = ref.init(jax.random.PRNGKey(2), xq, xk, xk, dup)
        of, af = fast.apply(params, xq, xk, xk, dup)
        orf, arf = ref.apply(params, xq, xk, xk, dup)
        assert of.shape == orf.shape and af.shape == arf.shape
        np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(af), np.asarray(arf),
                                   rtol=1e-5, atol=1e-6)

    def test_param_tree_identical(self):
        fast, ref = self._modules()
        xq = jnp.zeros((1, 4, 304))
        xk = jnp.zeros((1, 1, 304))
        pf = fast.init(jax.random.PRNGKey(0), xq, xk, xk)
        pr = ref.init(jax.random.PRNGKey(0), xq, xk, xk)
        assert (jax.tree_util.tree_structure(pf)
                == jax.tree_util.tree_structure(pr))
        assert all(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), pf, pr)))

    def test_gradient_equivalence(self):
        fast, ref = self._modules()
        B, N, C, dup = 2, 17, 304, 2
        xq = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
        xk = jax.random.normal(jax.random.PRNGKey(1), (dup * B, 1, C))
        params = ref.init(jax.random.PRNGKey(2), xq, xk, xk, dup)

        def loss(p, module):
            out, attn = module.apply(p, xq, xk, xk, dup)
            return jnp.sum(out * out) + jnp.sum(attn)

        gf = jax.grad(loss)(params, fast)
        gr = jax.grad(loss)(params, ref)

        def check(path, lf, lr):
            np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=jax.tree_util.keystr(path))

        jax.tree_util.tree_map_with_path(check, gf, gr)


class TestFusionMlpDedup:
    """The decomposed-MLP dedup (Block._mlp_dedup_update): fc1 runs on B
    instead of the duplicated 2B; LayerNorm's per-token affine commutes
    with the matmul, so on == off to float roundoff — values AND grads,
    through the full CrossAttention dup=2 train composition."""

    def _build(self, mlp_dedup):
        from cavp_tpu.models.attn import CrossAttention

        return CrossAttention(embed_dim=64, depth=1, num_heads=4,
                              mlp_dedup=mlp_dedup)

    def test_dup2_values_and_grads_match(self):
        import jax
        import numpy as np

        rng = np.random.RandomState(0)
        f_v = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
        f_a = jnp.asarray(rng.randn(4, 1, 1, 64).astype(np.float32))

        on, off = self._build(True), self._build(False)
        variables = on.init(jax.random.PRNGKey(0), f_v, f_a, dup=2)

        def run(mod, v, fv, fa):
            out_v, out_a, attn = mod.apply(v, fv, fa, dup=2)
            return out_v, out_a, attn

        a = run(on, variables, f_v, f_a)
        b = run(off, variables, f_v, f_a)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=2e-5)

        def loss(mod):
            def f(v):
                out_v, out_a, _ = mod.apply(v, f_v, f_a, dup=2)
                return (jnp.sum(out_v.astype(jnp.float32) ** 2)
                        + jnp.sum(out_a.astype(jnp.float32) ** 2))
            return f

        ga = jax.grad(loss(on))(variables)
        gb = jax.grad(loss(off))(variables)
        flat_a = jax.tree_util.tree_leaves(ga)
        flat_b = jax.tree_util.tree_leaves(gb)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-4, atol=5e-5)

    def test_param_tree_unchanged(self):
        """_LNRaw/_MlpRaw must keep the exact param names Mlp/LayerNorm
        created — converted torch checkpoints and the f64 parity
        harness depend on the tree."""
        import jax

        mod = self._build(True)
        variables = mod.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 4, 64)), jnp.zeros((2, 1, 1, 64)), dup=2)
        p = variables["params"]["block0"]
        assert set(p["mlp"].keys()) == {"fc1", "fc2"}
        assert set(p["mlp"]["fc1"].keys()) == {"kernel", "bias"}
        assert set(p["norm2"].keys()) == {"scale", "bias"}
