"""fused_optimizer == multi_transform, measured leaf by leaf.

The fused single-pass optimizer (engine/optim.py fused_optimizer) must
reproduce the production 6-group optax chain exactly: torch-SGD with
group lr multipliers / selective weight decay / the post-step lr lag
(trainer_cavp_avss_image.py:224-240 indexing), and bias-corrected Adam
on the audio tower (main_avss_resize.py:133). These tests drive both
transformations with identical random gradients over a param tree that
exercises every group label and assert the trajectories match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavp_tpu.config import get_config
from cavp_tpu.engine.optim import (fused_optimizer, label_params,
                                   make_optimizer)


def _param_tree(key):
    """One leaf per optimizer group label, real tree prefixes."""
    ks = jax.random.split(key, 8)
    n = iter(range(8))

    def p(shape):
        return jax.random.normal(ks[next(n)], shape, jnp.float32)

    return {
        "audio_net": {"conv": {"kernel": p((3, 3, 4, 8)),
                               "bias": p((8,))}},
        "segment": {"head": {"kernel": p((1, 1, 8, 4)),
                             "bias": p((4,))}},
        "backbone": {"conv1": {"kernel": p((3, 3, 3, 8)),
                               "scale": p((8,))}},
        "cross_att": {"q": {"kernel": p((8, 8))}},
        "visual_projector": {"fc": {"bias": p((8,))}},
    }


class TestFusedOptimizerEquivalence:
    @pytest.fixture(scope="class")
    def trajectories(self):
        cfg = get_config("avss").replace(lr=3e-3, momentum=0.9,
                                         weight_decay=1e-4, epochs=3,
                                         warm_up_epoch=1)
        tx_prod, schedule = make_optimizer(cfg, steps_per_epoch=4)
        tx_fused = fused_optimizer(cfg, schedule)

        params0 = _param_tree(jax.random.PRNGKey(0))
        out = {}
        for name, tx in (("prod", tx_prod), ("fused", tx_fused)):
            params = params0
            state = tx.init(params)
            upds_hist, params_hist = [], []
            for step in range(6):
                grads = jax.tree.map(
                    lambda p, s=step: jnp.asarray(
                        np.random.default_rng(s).normal(
                            size=p.shape).astype(np.float32)),
                    params)
                upds, state = tx.update(grads, state, params)
                params = jax.tree.map(lambda p, u: p + u, params, upds)
                upds_hist.append(upds)
                params_hist.append(params)
            out[name] = (upds_hist, params_hist)
        return out

    def test_labels_cover_all_groups(self):
        labels = set(jax.tree.leaves(label_params(
            _param_tree(jax.random.PRNGKey(0)))))
        assert labels == {"audio", "seg_decay", "seg_nodecay",
                          "bkb_decay", "bkb_nodecay", "fusion"}

    def test_updates_match_every_step(self, trajectories):
        prod_u, _ = trajectories["prod"]
        fused_u, _ = trajectories["fused"]
        for step, (a, b) in enumerate(zip(prod_u, fused_u)):
            for (path_a, ua), ub in zip(
                    jax.tree_util.tree_leaves_with_path(a),
                    jax.tree.leaves(b)):
                np.testing.assert_allclose(
                    np.asarray(ua), np.asarray(ub), rtol=1e-7, atol=0,
                    err_msg=f"step {step} {path_a}")

    def test_param_trajectory_matches(self, trajectories):
        _, prod_p = trajectories["prod"]
        _, fused_p = trajectories["fused"]
        for (path, pa), pb in zip(
                jax.tree_util.tree_leaves_with_path(prod_p[-1]),
                jax.tree.leaves(fused_p[-1])):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=0,
                err_msg=str(path))

    def test_state_checkpoint_roundtrip(self):
        """FusedOptState is a plain pytree: flatten/unflatten preserves
        it (what orbax needs for checkpoint/restore)."""
        cfg = get_config("avss").replace(lr=3e-3)
        _, schedule = make_optimizer(cfg, steps_per_epoch=4)
        tx = fused_optimizer(cfg, schedule)
        state = tx.init(_param_tree(jax.random.PRNGKey(1)))
        leaves, treedef = jax.tree_util.tree_flatten(state)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(rebuilt)):
            assert a is b

    def test_config_flag_routes_to_fused(self):
        cfg = get_config("avss").replace(fused_optimizer=True)
        tx, _ = make_optimizer(cfg, steps_per_epoch=4)
        params = _param_tree(jax.random.PRNGKey(2))
        state = tx.init(params)
        assert type(state).__name__ == "FusedOptState"
