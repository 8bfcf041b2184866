"""Converter coverage for the HRNet / OCR / PVT naming schemes: spot
translations land on real flax leaves of initialized models."""

import flax
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.engine.convert import translate_torch_key
from cavp_tpu.models import CAVP


def _flat_params(seg_model):
    model = CAVP(num_classes=3, seg_model=seg_model, visual_backbone=50)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 96, 64, 1)), eval_mode=True)
    p = flax.traverse_util.flatten_dict(
        jax.device_get(variables["params"]), sep=".")
    b = flax.traverse_util.flatten_dict(
        jax.device_get(variables["batch_stats"]), sep=".")
    return p, b


HRNET_CASES = [
    ("backbone.conv1.weight", "backbone.conv1.kernel", "p"),
    ("backbone.bn2.running_var", "backbone.bn2.var", "b"),
    ("backbone.layer1.3.downsample.0.weight", None, None),  # only block 0
    ("backbone.layer1.0.downsample.0.weight",
     "backbone.layer1_0.downsample_conv.kernel", "p"),
    ("backbone.transition1.0.0.weight",
     "backbone.transition1_0_conv.kernel", "p"),
    ("backbone.transition1.1.0.0.weight",
     "backbone.transition1_1_conv.kernel", "p"),
    ("backbone.transition1.1.0.1.running_mean",
     "backbone.transition1_1_bn.mean", "b"),
    ("backbone.stage3.2.branches.1.3.conv2.weight",
     "backbone.stage3_module2.branch1_block3.conv2.kernel", "p"),
    ("backbone.stage4.0.fuse_layers.0.3.0.weight",
     "backbone.stage4_module0.fuse0_3_conv.kernel", "p"),
    ("backbone.stage4.0.fuse_layers.0.3.1.weight",
     "backbone.stage4_module0.fuse0_3_bn.scale", "p"),
    ("backbone.stage4.0.fuse_layers.3.0.2.0.weight",
     "backbone.stage4_module0.fuse3_0_conv2.kernel", "p"),
    ("backbone.stage4.0.fuse_layers.3.0.1.1.bias",
     "backbone.stage4_module0.fuse3_0_bn1.bias", "p"),
    ("segment.upsample.last_conv.0.weight",
     "segment.last_conv.kernel", "p"),
    ("segment.upsample.last_conv.1.running_mean",
     "segment.last_bn.mean", "b"),
    ("segment.upsample.classifier.weight",
     "segment.classifier.kernel", "p"),
]

OCR_CASES = [
    ("segment.conv3x3.0.weight", "segment.conv3x3.conv.kernel", "p"),
    ("segment.conv3x3.1.bias", "segment.conv3x3.bn.bias", "p"),
    ("segment.ocr_distri_head.object_context_block.f_pixel.0.weight",
     "segment.attention.f_pixel_0.conv.kernel", "p"),
    ("segment.ocr_distri_head.object_context_block.f_pixel.4.running_var",
     "segment.attention.f_pixel_1.bn.var", "b"),
    ("segment.ocr_distri_head.object_context_block.f_object.3.weight",
     "segment.attention.f_object_1.conv.kernel", "p"),
    ("segment.ocr_distri_head.object_context_block.f_down.0.bias",
     "segment.attention.f_down.conv.bias", "p"),
    ("segment.ocr_distri_head.object_context_block.f_up.1.weight",
     "segment.attention.f_up.bn.scale", "p"),
    ("segment.ocr_distri_head.conv_bn_dropout.0.weight",
     "segment.bottleneck.conv.kernel", "p"),
    ("segment.aux_head.0.weight", "segment.aux_conv.conv.kernel", "p"),
    ("segment.aux_head.3.bias", "segment.aux_cls.bias", "p"),
    ("segment.upsample.weight", "segment.classifier.kernel", "p"),
]

PVT_CASES = [
    ("backbone.patch_embed1.proj.weight",
     "backbone.patch_embed1_proj.kernel", "p"),
    ("backbone.patch_embed2.norm.weight",
     "backbone.patch_embed2_norm.scale", "p"),
    ("backbone.block3.5.attn.q.weight",
     "backbone.block3_5.attn.q.kernel", "p"),
    ("backbone.block3.5.attn.kv.weight",
     "backbone.block3_5.attn.kv.kernel", "p"),
    ("backbone.block1.0.attn.sr.weight",
     "backbone.block1_0.attn.sr.kernel", "p"),
    ("backbone.block1.0.attn.norm.bias",
     "backbone.block1_0.attn.norm.bias", "p"),
    ("backbone.block2.1.mlp.dwconv.dwconv.weight",
     "backbone.block2_1.mlp.dwconv.kernel", "p"),
    ("backbone.norm4.weight", "backbone.norm4.scale", "p"),
]


def _check(cases, seg_model, flat_p, flat_b):
    for tkey, expected, coll in cases:
        got = translate_torch_key(tkey, seg_model)
        if expected is None:
            if got is not None:
                # translation may exist but must not hit a real leaf
                mod, leaf = got.rsplit(".", 1)
                name = {"weight": "kernel", "running_mean": "mean",
                        "running_var": "var"}.get(leaf, leaf)
                assert f"{mod}.{name}" not in flat_p
                assert f"{mod}.{name}" not in flat_b
            continue
        assert got is not None, tkey
        mod, leaf = got.rsplit(".", 1)
        exp_mod, exp_leaf = expected.rsplit(".", 1)
        # map torch leaf -> flax leaf for lookup
        lookup = {"weight": ("kernel", "scale"), "bias": ("bias",),
                  "running_mean": ("mean",), "running_var": ("var",)}
        target = flat_p if coll == "p" else flat_b
        candidates = [f"{mod}.{n}" for n in lookup.get(leaf, (leaf,))]
        assert expected in candidates, (tkey, got, expected)
        assert expected in target, (tkey, expected)


class TestHRNetNames:
    def test_spot_translations(self):
        flat_p, flat_b = _flat_params("HRNet")
        _check(HRNET_CASES, "HRNet", flat_p, flat_b)


class TestOCRNames:
    def test_spot_translations(self):
        flat_p, flat_b = _flat_params("OCR")
        _check(OCR_CASES, "OCR", flat_p, flat_b)


class TestPVTNames:
    def test_spot_translations(self):
        flat_p, flat_b = _flat_params("PVT")
        _check(PVT_CASES, "PVT", flat_p, flat_b)


class TestExportRoundTrip:
    """Full export -> import loop per seg variant (VERDICT r1 item 6):
    every flax leaf must survive the torch namespace and come back
    bit-identical, with nothing missing or unexpected."""

    @pytest.mark.parametrize("seg_model", ["HRNet", "OCR", "PVT"])
    def test_round_trip(self, seg_model):
        import numpy as np

        from cavp_tpu.engine.convert import (export_torch_state_dict,
                                             import_torch_state_dict)
        from cavp_tpu.models import CAVP

        model = CAVP(num_classes=3, seg_model=seg_model, visual_backbone=50)
        rng = jax.random.PRNGKey(1)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 96, 64, 1)), eval_mode=True)
        params = jax.device_get(variables["params"])
        bstats = jax.device_get(variables["batch_stats"])

        sd = export_torch_state_dict(params, bstats, seg_model=seg_model)
        assert sd, "empty export"

        # import into a zeroed copy of the same tree
        zeros_p = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
        zeros_b = jax.tree_util.tree_map(lambda x: np.zeros_like(x), bstats)
        new_p, new_b, report = import_torch_state_dict(
            sd, zeros_p, zeros_b, seg_model=seg_model)
        assert report["unexpected"] == [], report["unexpected"][:10]
        assert report["missing"] == [], report["missing"][:10]

        flat_a = flax.traverse_util.flatten_dict(params, sep=".")
        flat_c = flax.traverse_util.flatten_dict(new_p, sep=".")
        for k in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                          np.asarray(flat_c[k]), err_msg=k)
        flat_a = flax.traverse_util.flatten_dict(bstats, sep=".")
        flat_c = flax.traverse_util.flatten_dict(new_b, sep=".")
        for k in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                          np.asarray(flat_c[k]), err_msg=k)
