"""Full-model numeric parity for the non-flagship seg variants:
assembled torch CAVP-HRNet / CAVP-OCR / CAVP-PVT (tests/torch_ref_variants)
vs the flax rebuild, weights transferred through the converter.

Together with tests/test_full_model_parity.py (flagship) this closes the
loop: every seg head the reference supports is logit-parity-tested
end-to-end, so converted reference checkpoints of any variant reproduce.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cavp_tpu.engine.convert import import_torch_state_dict
from cavp_tpu.models.cavp import CAVP

from torch_ref import randomize_bn_stats
from torch_ref_variants import TorchCAVPVariant

TOL = dict(rtol=2e-3, atol=2e-3)


def build_pair(seg_model, num_classes=7, seed=0):
    torch.manual_seed(seed)
    tmodel = TorchCAVPVariant(seg_model, num_classes=num_classes,
                              pvt_variant="b1")
    randomize_bn_stats(tmodel, seed=seed + 1)
    tmodel.eval()

    fmodel = CAVP(num_classes=num_classes, seg_model=seg_model,
                  pvt_variant="b1")
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32),
                            jnp.zeros((1, 96, 64, 1), jnp.float32),
                            True)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, report = import_torch_state_dict(
        sd, variables["params"], variables["batch_stats"],
        seg_model=seg_model)
    return tmodel, fmodel, {"params": params,
                            "batch_stats": batch_stats}, report


@pytest.mark.parametrize("seg_model", ["HRNet", "OCR", "PVT"])
def test_variant_logits_match_torch(seg_model):
    tmodel, fmodel, variables, report = build_pair(seg_model)
    assert report["missing"] == [], (seg_model, report["missing"][:15])
    assert report["unexpected"] == [], (seg_model, report["unexpected"][:15])

    torch.manual_seed(42)
    img = torch.randn(1, 3, 64, 64)
    aud = torch.randn(1, 1, 96, 64)
    with torch.no_grad():
        ref_logits, ref_fused = tmodel.forward_inference(img, aud)

    logits, fused, _ = fmodel.apply(
        variables,
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(aud.numpy().transpose(0, 2, 3, 1)),
        True)
    got = np.asarray(logits).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_logits.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(fused).transpose(0, 3, 1, 2), ref_fused.numpy(), **TOL)
