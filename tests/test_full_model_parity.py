"""Full-model numeric parity: assembled torch CAVP vs the flax rebuild.

VERDICT round-1 item 1: the strongest available proxy for the released
checkpoints (``test_avs_semantic.py:204-207``) — an inline torch replica
of the complete CAVP (tests/torch_ref.py) with random weights +
randomized BN stats, exported through the converter, compared
logit-for-logit. Any composition mistake (interp align_corners, BN
placement, stem naming, flatten order, shared norm1) fails this test.

Also locks the converter round trip: flax -> torch state_dict loads
strict=True into the replica and reproduces identical torch logits.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cavp_tpu.engine.convert import (export_torch_state_dict,
                                     import_torch_state_dict)
from cavp_tpu.models.cavp import CAVP

from torch_ref import TorchCAVP, randomize_bn_stats


def build_pair(num_classes=71, dilation=(False, False, False), seed=0):
    """Random torch CAVP -> converted flax variables. Returns
    (torch_model.eval(), flax_model, variables, report)."""
    torch.manual_seed(seed)
    tmodel = TorchCAVP(num_classes=num_classes,
                       last_three_dilation_stride=dilation)
    randomize_bn_stats(tmodel, seed=seed + 1)
    tmodel.eval()

    fmodel = CAVP(num_classes=num_classes, seg_model="DeepLabV3Plus",
                  visual_backbone=50, last_three_dilation_stride=dilation)
    # Param shapes are resolution-independent; init tiny for speed.
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32),
                            jnp.zeros((1, 96, 64, 1), jnp.float32),
                            True)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, report = import_torch_state_dict(
        sd, variables["params"], variables["batch_stats"])
    return tmodel, fmodel, {"params": params, "batch_stats": batch_stats}, report


class TestFullModelParity:
    @pytest.fixture(scope="class")
    def pair(self):
        return build_pair()

    def test_conversion_is_exhaustive(self, pair):
        _, _, _, report = pair
        assert report["missing"] == [], report["missing"][:20]
        assert report["unexpected"] == [], report["unexpected"][:20]

    def test_logits_match_at_224(self, pair):
        tmodel, fmodel, variables, _ = pair
        torch.manual_seed(42)
        img = torch.randn(2, 3, 224, 224)
        aud = torch.randn(2, 1, 96, 64)
        with torch.no_grad():
            ref_logits, ref_fused, _ = tmodel.forward_inference(img, aud)

        logits, fused, _ = fmodel.apply(
            variables,
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(aud.numpy().transpose(0, 2, 3, 1)),
            True)  # eval_mode
        got = np.asarray(logits).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_logits.numpy(), rtol=1e-3,
                                   atol=1e-3)
        # fused feature too (the CoroCL input) — catches head-only luck
        np.testing.assert_allclose(
            np.asarray(fused).transpose(0, 3, 1, 2), ref_fused.numpy(),
            rtol=1e-3, atol=1e-3)
        # argmax agreement — the metric-level consequence
        assert (got.argmax(1) == ref_logits.numpy().argmax(1)).mean() > 0.999

    def test_export_round_trip_torch_identical(self, pair):
        tmodel, _, variables, _ = pair
        sd = export_torch_state_dict(variables["params"],
                                     variables["batch_stats"])
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        missing, unexpected = tmodel.load_state_dict(tsd, strict=False)
        # pos embeds and cls_head are exported; nothing should be missing
        assert missing == [], missing[:20]
        assert unexpected == [], unexpected[:20]
        torch.manual_seed(7)
        img = torch.randn(1, 3, 128, 128)
        aud = torch.randn(1, 1, 96, 64)
        with torch.no_grad():
            a, _, _ = tmodel.forward_inference(img, aud)
        # reload the original and compare: round trip must be lossless
        torch.manual_seed(0)
        t2 = TorchCAVP(num_classes=71)
        randomize_bn_stats(t2, seed=1)
        t2.eval()
        with torch.no_grad():
            b, _, _ = t2.forward_inference(img, aud)
        np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-5, atol=1e-6)


class TestFullModelParity512:
    """The avss path runs at 512x512 (config_avss.py:9-77)."""

    def test_logits_match_at_512(self):
        tmodel, fmodel, variables, report = build_pair(seed=3)
        assert report["missing"] == []
        torch.manual_seed(11)
        img = torch.randn(1, 3, 512, 512)
        aud = torch.randn(1, 1, 96, 64)
        with torch.no_grad():
            ref_logits, _, _ = tmodel.forward_inference(img, aud)
        logits, _, _ = fmodel.apply(
            variables,
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(aud.numpy().transpose(0, 2, 3, 1)),
            True)
        got = np.asarray(logits).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_logits.numpy(), rtol=1e-3,
                                   atol=1e-3)


class TestVPOVariantParity:
    """VPO flavor: ResNet-50 visual is replaced by dilation [F,T,T]
    (config_vpo_ss.py:49-50 uses ResNet-101; ResNet-50 with the same
    dilation pattern exercises the identical code path at test cost)."""

    def test_dilated_backbone_logits(self):
        tmodel, fmodel, variables, report = build_pair(
            num_classes=22, dilation=(False, True, True), seed=5)
        assert report["missing"] == []
        torch.manual_seed(13)
        img = torch.randn(1, 3, 128, 128)
        aud = torch.randn(1, 1, 96, 64)
        with torch.no_grad():
            ref_logits, _, _ = tmodel.forward_inference(img, aud)
        logits, _, _ = fmodel.apply(
            variables,
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(aud.numpy().transpose(0, 2, 3, 1)),
            True)
        got = np.asarray(logits).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_logits.numpy(), rtol=1e-3,
                                   atol=1e-3)
