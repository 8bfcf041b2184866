#!/usr/bin/env python
"""Export a checkpoint to a self-contained StableHLO predict artifact.

    python scripts/export_model.py --setup avss --resize_flag \
        --ckpt_path ./converted/avss_224 --out ./artifacts/avss_224 \
        [--export_batch 8]

The artifact (predict.stablehlo + meta.json) serves masks without the
model code or checkpoint: see cavp_tpu/engine/export.py and
docs/serving.md.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"  # export is host-side tracing

    import jax

    from cavp_tpu.config import load_args_and_config
    from cavp_tpu.engine import load_model_variables, make_optimizer
    from cavp_tpu.engine.export import export_predict
    from cavp_tpu.engine.runner import build_model, init_state
    from cavp_tpu.parallel import create_mesh
    from cavp_tpu.utils import logger

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", required=True)
    extra.add_argument("--export_batch", type=int, default=1)
    extra_args, rest = extra.parse_known_args()
    config = load_args_and_config(rest)

    mesh = create_mesh(num_devices=1)
    model = build_model(config)
    tx, _ = make_optimizer(config, 1)
    state = init_state(config, model, tx, mesh)
    params, batch_stats = state.params, state.batch_stats
    if config.ckpt_path:
        params, batch_stats, report = load_model_variables(
            config.ckpt_path, params, batch_stats,
            seg_model=config.seg_model)
        if report["missing"] or report["unexpected"]:
            raise SystemExit(f"strict load failed: {report['missing'][:5]} "
                             f"{report['unexpected'][:5]}")
    out = export_predict(model, {"params": params,
                                 "batch_stats": batch_stats},
                         config, extra_args.out,
                         batch_size=extra_args.export_batch)
    logger.info("exported predict artifact -> %s" % out)


if __name__ == "__main__":
    main()
