"""Spatially-sharded high-res inference == single-device forward.

The SP capability (cavp_tpu/parallel/spatial.py): the image's H axis is
sharded over the 8-virtual-device mesh; XLA inserts conv halo
exchanges; sigmoid-CA shards per-token with no collectives. Logits and
metric accumulators must match the unsharded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.engine.loops import eval_metrics_init, make_eval_step
from cavp_tpu.models.cavp import CAVP
from cavp_tpu.parallel import create_mesh
from cavp_tpu.parallel.spatial import (make_spatial_eval_step,
                                       make_spatial_infer)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("avss").replace(
        image_width=128, image_height=128, num_classes=7,
        visual_backbone=18, compute_dtype="float32")
    model = CAVP(num_classes=7, visual_backbone=18)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    audio = jnp.asarray(rng.randn(1, 96, 64, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, audio, True)
    return cfg, model, variables, image, audio


class TestSpatialSharding:
    def test_sharded_logits_match_single_device(self, setup):
        cfg, model, variables, image, audio = setup
        ref, _, _ = jax.jit(
            lambda v, i, a: model.apply(v, i, a, eval_mode=True)
        )(variables, image, audio)

        mesh = create_mesh(num_devices=8)
        # build-time variables: replicated over the mesh ONCE
        infer = make_spatial_infer(model, mesh, variables=variables)
        got = infer(image, audio)
        # sharded result is H-partitioned; same values
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # and it really is sharded over 8 devices
        assert len(got.sharding.device_set) == 8

    def test_sharded_eval_step_metrics_match(self, setup):
        cfg, model, variables, image, audio = setup
        rng = np.random.RandomState(1)
        batch = {
            "image": jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32)),
            "waveform": jnp.asarray(
                (rng.rand(2, 1, 16000).astype(np.float32) - 0.5) * 0.2),
            "pix_label": jnp.asarray(
                rng.randint(0, 7, (2, 128, 128)).astype(np.int32)),
            "valid": jnp.ones((2,), jnp.float32),
        }
        step = jax.jit(make_eval_step(model, cfg))
        ref = step(variables, eval_metrics_init(7), batch)

        mesh = create_mesh(num_devices=8)
        srun = make_spatial_eval_step(model, cfg, mesh)
        got = srun(variables, eval_metrics_init(7), batch)

        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
