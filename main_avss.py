#!/usr/bin/env python
"""Train CAVP on AVSBench-Semantics (512x512 path) — TPU-native.

Rebuilds ``main_avss.py`` (note the reference file has a literal
IndentationError at :200-201 and cannot run as committed; this rebuild
shares the working engine with main_avss_resize). Same CLI surface.
"""

from cavp_tpu.config import load_args_and_config
from cavp_tpu.data import AVSSDataset, collate_train_videos
from cavp_tpu.engine.runner import run_training
from cavp_tpu.utils import logger


def make_datasets(config):
    return (AVSSDataset(config, "train"), AVSSDataset(config, "test"),
            collate_train_videos)


def main():
    config = load_args_and_config()
    logger.warning("RUNNING AVSS")
    run_training(config, variant="avss", make_datasets=make_datasets)


if __name__ == "__main__":
    main()
