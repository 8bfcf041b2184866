#!/usr/bin/env python
"""Train CAVP on VPO (stereo audio) — TPU-native.

Rebuilds ``main_vpo_stereo.py``: ``CAVP(..., in_plane=2)`` (:90-98),
stereo amplitude panning + multi-source mixtures in the host pipeline.
"""

import pandas as pd

from cavp_tpu.config import load_args_and_config
from cavp_tpu.data import VPODataset, collate_train_frames, select_vpo_csv
from cavp_tpu.data.pipeline import collate_eval_frames
from cavp_tpu.engine.runner import run_training
from cavp_tpu.utils import logger


def make_datasets(config):
    csv = select_vpo_csv(config, stereo=True)
    df = pd.read_csv(csv)
    multi = config.setup in ("vpo_ms", "vpo_msmi")
    train_ds = VPODataset(config, "train", df, stereo=True,
                          multi_source=multi)
    test_ds = VPODataset(config, "test", df, stereo=True,
                         multi_source=multi)
    return train_ds, test_ds, collate_train_frames


def main():
    config = load_args_and_config().replace(in_plane=2)
    logger.warning("RUNNING VPO STEREO")
    run_training(config, variant="vpo_stereo", make_datasets=make_datasets,
                 eval_collate=collate_eval_frames, eval_batch_size=config.batch_size)


if __name__ == "__main__":
    main()
