#!/usr/bin/env python
"""Convert CAVP checkpoints between torch (.pth) and orbax formats.

Import (torch -> orbax):
    python scripts/convert_checkpoint.py --setup avss --resize_flag \
        --ckpt_path ./avss_224.pth --out ./converted/avss_224

Export (orbax -> reference-format .pth, loadable by the reference's
``torch.load(...)['model']`` tooling):
    python scripts/convert_checkpoint.py --setup avss --resize_flag \
        --ckpt_path ./converted/avss_224 --out ./avss_224_export.pth \
        --to_torch

The conversion is strict: any unconverted torch key or unfilled flax
leaf is reported and (unless --allow_partial) fails the run — the
opposite of the reference's silent strict=False habit
(utils/pyt_utils.load_model:42-60).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    import os

    # conversion is pure host work: pin CPU so init/placement never
    # touches the (possibly tunneled, slow) TPU — without this the
    # import path paid minutes of remote init compiles plus a full-param
    # H2D+D2H round trip at tunnel bandwidth for values that are
    # immediately overwritten. NOTE: importing cavp_tpu re-applies
    # JAX_PLATFORMS via the config API (CLAUDE.md), so the env var must
    # be set BEFORE that import and the config re-pinned after.
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    from cavp_tpu.config import load_args_and_config
    from cavp_tpu.engine import load_model_variables, make_optimizer
    from cavp_tpu.engine.checkpoint import save_checkpoint
    from cavp_tpu.engine.runner import build_model, init_state
    from cavp_tpu.parallel import create_mesh
    from cavp_tpu.utils import logger

    # cavp_tpu import re-applied JAX_PLATFORMS; with the env var set to
    # cpu above this is now a no-op re-pin, kept for belt-and-braces
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    assert jax.default_backend() == "cpu", jax.default_backend()

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", required=True)
    extra.add_argument("--allow_partial", action="store_true")
    extra.add_argument("--to_torch", action="store_true",
                       help="export an orbax checkpoint to a torch .pth")
    extra_args, rest = extra.parse_known_args()

    config = load_args_and_config(rest)

    if extra_args.to_torch:
        # pure host-side work — no model init (init on the tunneled TPU
        # is hundreds of small compiles, minutes of wasted wall clock)
        import torch

        from cavp_tpu.engine.checkpoint import restore_checkpoint
        from cavp_tpu.engine.convert import export_torch_state_dict

        payload = restore_checkpoint(config.ckpt_path)
        sd = export_torch_state_dict(payload["params"],
                                     payload["batch_stats"],
                                     seg_model=config.seg_model)
        tsd = {k: torch.from_numpy(__import__("numpy").ascontiguousarray(v))
               for k, v in sd.items()}
        torch.save({"model": tsd, "epoch": int(payload.get("step", 0)),
                    "iteration": int(payload.get("step", 0))},
                   extra_args.out)
        logger.info("exported %d torch keys -> %s"
                    % (len(tsd), extra_args.out))
        return

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
