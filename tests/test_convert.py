"""Checkpoint converter round-trip tests (SURVEY.md §7 "Checkpoint
conversion exactness")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.engine.convert import (
    export_torch_state_dict,
    import_torch_state_dict,
    translate_torch_key,
)
from cavp_tpu.models import CAVP


class TestKeyTranslation:
    def test_stem_and_layers(self):
        assert translate_torch_key("backbone.backbone.conv1.0.weight") == \
            "backbone.stem_conv1.weight"
        assert translate_torch_key("backbone.backbone.conv1.1.running_mean") \
            == "backbone.stem_bn1.running_mean"
        assert translate_torch_key(
            "module.backbone.backbone.layer4.2.downsample.0.weight") == \
            "backbone.layer4_2.downsample_conv.weight"

    def test_segment(self):
        assert translate_torch_key("segment.aspp.map_convs.3.weight") == \
            "segment.aspp.map_conv3.weight"
        assert translate_torch_key("segment.reduce.1.bias") == \
            "segment.reduce_bn.bias"
        assert translate_torch_key("segment.upsample.last_conv.4.weight") == \
            "segment.upsample.last_bn1.weight"

    def test_audio_vgg(self):
        assert translate_torch_key(
            "audio_backbone.backbone.features.11.bias") == \
            "audio_net.net.conv4.bias"
        assert translate_torch_key(
            "audio_backbone.backbone.embeddings.4.weight") == \
            "audio_net.net.fc2.weight"

    def test_drops(self):
        assert translate_torch_key(
            "backbone.backbone.bn1.num_batches_tracked") == "<drop>"


class TestRoundTrip:
    @pytest.fixture(scope="class")
    def variables(self):
        model = CAVP(num_classes=5, visual_backbone=18)
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 96, 64, 1)))

    def test_export_import_identity(self, variables):
        import flax

        params = jax.device_get(variables["params"])
        bs = jax.device_get(variables["batch_stats"])
        sd = export_torch_state_dict(params, bs)
        assert len(sd) > 100

        # perturb and re-import: must restore the exported values exactly
        zeros = jax.tree_util.tree_map(np.zeros_like, params)
        zb = jax.tree_util.tree_map(np.zeros_like, bs)
        new_p, new_b, report = import_torch_state_dict(sd, zeros, zb)
        assert not report["unexpected"], report["unexpected"][:5]
        assert not report["missing"], report["missing"][:5]

        fp_a = flax.traverse_util.flatten_dict(params, sep=".")
        fp_b = flax.traverse_util.flatten_dict(new_p, sep=".")
        for k in fp_a:
            np.testing.assert_array_equal(
                np.asarray(fp_a[k]), np.asarray(fp_b[k]), err_msg=k)

    def test_conv_layout_transposed(self, variables):
        params = jax.device_get(variables["params"])
        bs = jax.device_get(variables["batch_stats"])
        sd = export_torch_state_dict(params, bs)
        # torch conv weights are OIHW
        w = sd["backbone.backbone.conv1.0.weight"]
        assert w.shape == (64, 3, 3, 3)
        # torch linear weights are [out, in]
        fc = sd["audio_backbone.backbone.embeddings.0.weight"]
        assert fc.shape == (4096, 512 * 4 * 6)
