"""Runner helpers: mesh sizing from --gpus, eval batch padding."""

import numpy as np

import jax

from cavp_tpu.config import get_config
from cavp_tpu.engine.runner import _make_mesh, _pad_to_devices


class TestMakeMesh:
    def test_clamps_to_devices_and_batch(self):
        cfg = get_config("avss").replace(gpus=64, batch_size=6)
        mesh = _make_mesh(cfg)
        n = mesh.devices.size
        assert n <= len(jax.devices())
        assert 6 % n == 0

    def test_single_device_default(self):
        cfg = get_config("avss").replace(gpus=1, batch_size=16)
        assert _make_mesh(cfg).devices.size == 1


class TestPadToDevices:
    def test_pads_with_zero_valid(self):
        batch = {
            "image": np.ones((10, 4, 4, 3), np.float32),
            "valid": np.ones((10,), np.float32),
        }
        out = _pad_to_devices(batch, 8)
        assert out["image"].shape[0] == 16
        assert out["valid"][10:].sum() == 0
        np.testing.assert_array_equal(out["image"][:10], batch["image"])

    def test_noop_when_divisible(self):
        batch = {"image": np.ones((8, 2, 2, 3)), "valid": np.ones((8,))}
        out = _pad_to_devices(batch, 8)
        assert out is batch
