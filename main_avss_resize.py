#!/usr/bin/env python
"""Train CAVP on AVSBench-Semantics (resize path) — TPU-native.

Rebuilds ``main_avss_resize.py`` (the working AVSS/AVS-Object train
entry): same CLI (``--setup avss --gpus N --batch_size ...``), one
engine instead of the copy-pasted main() (see
cavp_tpu/engine/runner.py). ``--gpus`` selects the number of
data-parallel devices on the mesh rather than spawning processes.
"""

from cavp_tpu.config import load_args_and_config
from cavp_tpu.data import AVSSDataset, collate_train_videos
from cavp_tpu.engine.runner import run_training
from cavp_tpu.utils import logger


def make_datasets(config):
    train_ds = AVSSDataset(config, "train")
    test_ds = AVSSDataset(config, "test")
    return train_ds, test_ds, collate_train_videos


def main():
    config = load_args_and_config()
    logger.warning("RUNNING AVSS (resize)")
    logger.warning(f"SETUP: {config.setup} | EPOCH: {config.epochs} | "
                   f"BACKBONE: {config.visual_backbone} | "
                   f"BATCH SIZE: {config.batch_size} | LR: {config.lr}")
    run_training(config, variant="avss", make_datasets=make_datasets)


if __name__ == "__main__":
    main()
