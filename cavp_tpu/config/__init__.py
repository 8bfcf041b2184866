from cavp_tpu.config.class_list import (
    COCO_CLASS_DICT,
    INDEX_TABLE_AVS,
    INDEX_TABLE_COCO,
)
from cavp_tpu.config.flags import build_parser, load_args_and_config
from cavp_tpu.config.setups import Config, get_config

__all__ = [
    "Config",
    "get_config",
    "build_parser",
    "load_args_and_config",
    "INDEX_TABLE_AVS",
    "INDEX_TABLE_COCO",
    "COCO_CLASS_DICT",
]
