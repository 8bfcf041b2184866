#!/usr/bin/env python
"""Evaluate a CAVP checkpoint on AVSBench-Semantics — TPU-native.

Rebuilds ``test_avs_semantic.py``: load ``avss_224.pth`` (torch, via the
strict converter) or an orbax checkpoint, run the batched validation
once, print the |ALL| and |MS| metric lines.
"""

import jax

from cavp_tpu.config import load_args_and_config
from cavp_tpu.data import AVSSDataset, DataLoader, collate_eval_videos
from cavp_tpu.engine import load_model_variables, make_optimizer
from cavp_tpu.engine.runner import build_model, init_state, run_validation
from cavp_tpu.parallel import create_mesh, initialize_distributed, replicate
from cavp_tpu.utils import logger


def main():
    config = load_args_and_config()
    initialize_distributed()
    mesh = create_mesh()
    model = build_model(config)
    tx, _ = make_optimizer(config, 1)
    state = init_state(config, model, tx, mesh)

    ckpt = getattr(config, "ckpt_path", "") or "./avss_224.pth"
    params, batch_stats, report = load_model_variables(
        ckpt, state.params, state.batch_stats,
        seg_model=config.seg_model)
    if report["unexpected"]:
        logger.warning(f"unconverted torch keys: {report['unexpected'][:10]}")
    if report["missing"]:
        logger.warning(f"unfilled flax leaves: {report['missing'][:10]}")
    # replicate over the mesh — a bare device_put commits to one
    # device and clashes with mesh-sharded eval batches
    state = state.replace(params=replicate(params, mesh),
                          batch_stats=replicate(batch_stats, mesh))

    test_ds = AVSSDataset(config, "test")
    videos_per_batch = 8 if config.resize_flag else 1
    loader = DataLoader(test_ds, videos_per_batch, collate_eval_videos,
                        num_workers=config.num_workers,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        pad_shards=False)
    results = run_validation(config, model, state, loader, mesh)
    logger.info(
        "|ALL| mIoU: %.4f | acc: %.4f | fdr: %.4f | f_1: %.4f | f_0.3: %.4f"
        % (results["miou"], results["acc"], results["fdr"], results["f_1"],
           results["f_0.3"]))
    logger.info(
        "|MS| mIoU: %.4f | acc: %.4f | fdr: %.4f | f_1: %.4f | f_0.3: %.4f"
        % (results["miou_ms"], results["acc_ms"], results["fdr_ms"],
           results["f_1_ms"], results["f_0.3_ms"]))


if __name__ == "__main__":
    main()
