"""Interpolation parity vs torch F.interpolate (all three conventions)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from cavp_tpu.ops.interp import interpolate_bilinear, interpolate_nearest


def _rand(b=2, h=14, w=14, c=5, seed=0):
    return np.random.RandomState(seed).randn(b, h, w, c).astype(np.float32)


class TestBilinear:
    def test_align_corners_false_upsample(self):
        x = _rand()
        ours = np.asarray(interpolate_bilinear(jnp.asarray(x), (56, 56),
                                               align_corners=False))
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=(56, 56), mode="bilinear",
                             align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_align_corners_true_upsample(self):
        x = _rand(seed=1)
        ours = np.asarray(interpolate_bilinear(jnp.asarray(x), (56, 56),
                                               align_corners=True))
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=(56, 56), mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_downsample(self):
        x = _rand(h=32, w=32, seed=2)
        ours = np.asarray(interpolate_bilinear(jnp.asarray(x), (9, 9),
                                               align_corners=False))
        ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=(9, 9), mode="bilinear",
                             align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestNearest:
    def test_matches_torch_nearest(self):
        rng = np.random.RandomState(3)
        lab = rng.randint(0, 7, (2, 37, 53)).astype(np.int32)
        ours = np.asarray(interpolate_nearest(jnp.asarray(lab), (14, 14)))
        ref = tF.interpolate(torch.from_numpy(lab).unsqueeze(1).float(),
                             size=(14, 14), mode="nearest").squeeze(1).long()
        np.testing.assert_array_equal(ours, ref.numpy())
