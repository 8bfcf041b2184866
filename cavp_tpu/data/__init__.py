from cavp_tpu.data.avsbench import MS3Dataset, S4Dataset
from cavp_tpu.data.avss import AVSSDataset
from cavp_tpu.data.pipeline import (
    DataLoader,
    collate_eval_videos,
    collate_stack,
    collate_train_frames,
    collate_train_videos,
    flatten_video_batch,
)
from cavp_tpu.data.transforms import VisualAugmentation
from cavp_tpu.data.vpo import VPODataset, select_vpo_csv

__all__ = [
    "AVSSDataset",
    "S4Dataset",
    "MS3Dataset",
    "VPODataset",
    "select_vpo_csv",
    "VisualAugmentation",
    "DataLoader",
    "collate_stack",
    "collate_train_videos",
    "collate_train_frames",
    "collate_eval_videos",
    "flatten_video_batch",
]
