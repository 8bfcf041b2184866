#!/usr/bin/env python
"""Convert a torch CAVP checkpoint (.pth) to an orbax checkpoint.

Usage:
    python scripts/convert_checkpoint.py --setup avss --resize_flag \
        --ckpt_path ./avss_224.pth --out ./converted/avss_224

The conversion is strict: any unconverted torch key or unfilled flax
leaf is reported and (unless --allow_partial) fails the run — the
opposite of the reference's silent strict=False habit
(utils/pyt_utils.load_model:42-60).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    import jax

    from cavp_tpu.config import load_args_and_config
    from cavp_tpu.engine import load_model_variables, make_optimizer
    from cavp_tpu.engine.checkpoint import save_checkpoint
    from cavp_tpu.engine.runner import build_model, init_state
    from cavp_tpu.parallel import create_mesh
    from cavp_tpu.utils import logger

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", required=True)
    extra.add_argument("--allow_partial", action="store_true")
    extra_args, rest = extra.parse_known_args()

    config = load_args_and_config(rest)
    mesh = create_mesh(num_devices=1)
    model = build_model(config)
    tx, _ = make_optimizer(config, 1)
    state = init_state(config, model, tx, mesh)

    params, batch_stats, report = load_model_variables(
        config.ckpt_path, state.params, state.batch_stats,
        seg_model=config.seg_model)
    logger.info("converted %d keys" % len(report["converted"]))
    if report["unexpected"]:
        logger.warning("unexpected torch keys: %s" % report["unexpected"])
    if report["missing"]:
        logger.warning("unfilled flax leaves: %s" % report["missing"])
    if (report["unexpected"] or report["missing"]) and \
            not extra_args.allow_partial:
        raise SystemExit("strict conversion failed; use --allow_partial "
                         "to force")
    state = state.replace(params=jax.device_put(params),
                          batch_stats=jax.device_put(batch_stats))
    path = save_checkpoint(extra_args.out, state)
    logger.info("wrote %s" % path)


if __name__ == "__main__":
    main()
