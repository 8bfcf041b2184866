"""pjit sharding equivalence (SURVEY.md §4e): the same train step over a
1-device and an 8-device mesh must produce the same loss and parameter
update — the TPU-native "multi-node test without a cluster"."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.config import get_config
from cavp_tpu.data.synthetic import synthetic_eval_batch, synthetic_train_batch
from cavp_tpu.engine.loops import (
    eval_metrics_init,
    eval_metrics_result,
    make_eval_step,
    make_train_step,
)
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import create_train_state
from cavp_tpu.engine.runner import build_model
from cavp_tpu.parallel import create_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("avss").replace(
        image_width=64, image_height=64, num_classes=7, batch_size=8,
        max_view=8, class_slots=2, compute_dtype="float32",
        visual_backbone=18)
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    sample = {"image": jnp.zeros((1, 64, 64, 3)),
              "audio": jnp.zeros((1, 96, 64, 1))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample, cfg)
    return cfg, model, tx, state


def _run(cfg, model, tx, state, n_dev):
    mesh = create_mesh(num_devices=n_dev)
    st = replicate(state, mesh)
    batch = shard_batch({k: jnp.asarray(v) for k, v in
                         synthetic_train_batch(cfg).items()}, mesh)
    step = jax.jit(make_train_step(model, tx, cfg, variant="avss"))
    st, metrics = step(st, batch, jax.random.PRNGKey(7), jnp.asarray(1))
    return float(metrics["loss/loss"]), jax.device_get(st.params)


class TestShardingEquivalence:
    def test_loss_matches_1_vs_8_devices(self, setup):
        cfg, model, tx, state = setup
        assert len(jax.devices()) >= 8, "needs the 8-device CPU mesh"
        loss1, params1 = _run(cfg, model, tx, state, 1)
        loss8, params8 = _run(cfg, model, tx, state, 8)
        np.testing.assert_allclose(loss1, loss8, rtol=2e-4)
        l1 = jax.tree_util.tree_leaves(params1)
        l8 = jax.tree_util.tree_leaves(params8)
        worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l8))
        # fp32 reduction-order differences (sharded vs single-device sums
        # in BN stats + grad allreduce) amplified by the 10x seg-head LR;
        # one step stays within ~1e-3 absolute.
        assert worst < 1.5e-3, f"param divergence {worst}"

    def test_eval_step_sharded(self, setup):
        cfg, model, tx, state = setup
        mesh = create_mesh(num_devices=8)
        eval_step = jax.jit(make_eval_step(model, cfg))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = shard_batch({k: jnp.asarray(v) for k, v in
                             synthetic_eval_batch(cfg, 16).items()}, mesh)
        metrics = eval_step(variables, eval_metrics_init(cfg.num_classes),
                            batch)
        res = eval_metrics_result(metrics)
        assert np.isfinite(float(res["miou"]))
