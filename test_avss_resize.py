#!/usr/bin/env python
"""Evaluate a CAVP checkpoint on AVSBench-Object (S4/MS3 J&F) — TPU-native.

Rebuilds ``test_avss_resize.py``: ``--avsbench_split v1s`` -> S4Dataset,
``v1m`` -> MS3Dataset (:164-172); loads ``cavp_avsobj_ss.pth`` (or
--ckpt_path) and reports mIoU / F-score / J&F.
"""

import jax

from cavp_tpu.config import load_args_and_config
from cavp_tpu.data import DataLoader, MS3Dataset, S4Dataset, collate_eval_videos
from cavp_tpu.engine import load_model_variables, make_optimizer
from cavp_tpu.engine.runner import build_model, init_state, run_jf_test
from cavp_tpu.parallel import create_mesh, replicate
from cavp_tpu.utils import logger


def main():
    config = load_args_and_config()
    # binary eval path: 2 classes (test_avss_resize.py:254-255)
    config = config.replace(num_classes=2)
    mesh = create_mesh()
    model = build_model(config)
    tx, _ = make_optimizer(config, 1)
    state = init_state(config, model, tx, mesh)

    ckpt = getattr(config, "ckpt_path", "") or "./cavp_avsobj_ss.pth"
    params, batch_stats, report = load_model_variables(
        ckpt, state.params, state.batch_stats,
        seg_model=config.seg_model)
    if report["unexpected"]:
        logger.warning(f"unconverted torch keys: {report['unexpected'][:10]}")
    # replicate over the mesh — a bare device_put commits to one
    # device and clashes with mesh-sharded eval batches
    state = state.replace(params=replicate(params, mesh),
                          batch_stats=replicate(batch_stats, mesh))

    if config.avsbench_split == "v1s":
        test_ds = S4Dataset(config, "test")
    elif config.avsbench_split == "v1m":
        test_ds = MS3Dataset(config, "test")
    else:
        raise ValueError("use --avsbench_split v1s|v1m for J&F eval")

    videos_per_batch = 4 if config.resize_flag else 1
    loader = DataLoader(test_ds, videos_per_batch, collate_eval_videos,
                        num_workers=config.num_workers)
    results = run_jf_test(config, model, state, loader)
    logger.info("mIoU: {miou:.4f} | F: {F_score:.4f} | J&F: {jf:.4f}".format(
        jf=results["J&F"], **results))


if __name__ == "__main__":
    main()
