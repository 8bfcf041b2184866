"""--use_baseline path: VisualModel train/eval through the shared steps."""

import numpy as np

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


class TestBaseline:
    def test_train_and_eval(self):
        cfg = get_config("avss").replace(
            num_classes=5, batch_size=4, image_width=64, image_height=64,
            compute_dtype="float32", visual_backbone=18, use_baseline=True)
        model = build_model(cfg)
        assert type(model).__name__ == "VisualModel"
        tx, _ = make_optimizer(cfg.replace(lr=1e-3), 10)
        sample = {"image": jnp.zeros((1, 64, 64, 3)),
                  "audio": jnp.zeros((1, 96, 64, 1))}
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                                   cfg)
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_train_batch(cfg).items()}
        step = jax.jit(make_train_step(model, tx, cfg, variant="baseline"))
        s1, m = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(0))
        assert np.isfinite(float(m["loss/loss"]))
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(s1.params)))
        assert changed

        eval_step = jax.jit(make_eval_step(model, cfg))
        eb = {k: jnp.asarray(v) for k, v in
              synthetic_eval_batch(cfg, 8).items()}
        metrics = eval_step({"params": s1.params,
                             "batch_stats": s1.batch_stats},
                            eval_metrics_init(cfg.num_classes), eb)
        res = eval_metrics_result(metrics)
        assert np.isfinite(float(res["miou"]))
