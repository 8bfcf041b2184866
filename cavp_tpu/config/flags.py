"""CLI flag surface.

Rebuilds ``config/flags.py:12-101``: the same ~35 flags with the same
names and defaults, dispatched onto the dataclass setup registry. Flags
explicitly passed on the command line win over the setup defaults
(mirroring the EasyDict ``update`` in ``main_avss.py:211-212``); flags
left at their argparse default do NOT clobber setup-specific values for
fields the setups override (lr, epochs, batch_size, ...), matching the
reference behavior where the config module supplies those.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional, Sequence, Tuple

from cavp_tpu.config.setups import Config, get_config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Audio-Visual Recognition (TPU)")
    # hardware / launch
    parser.add_argument("--pvc", action="store_true", help="pvc or not")
    parser.add_argument("--dgx", action="store_true", help="dgx or not")
    parser.add_argument("--gpus", default=1, type=int,
                        help="# data-parallel devices (kept name for CLI compat)")
    parser.add_argument("--nodes", default=1, type=int)
    parser.add_argument("--local_rank", default=0, type=int)
    parser.add_argument("--num_workers", default=8, type=int)
    # wandb / run metadata
    parser.add_argument("--wandb_mode", default="disabled", type=str)
    parser.add_argument("--wandb_dir", default="./", type=str)
    parser.add_argument("--tags", nargs="+", default="")
    parser.add_argument("--run_note", default="", type=str)
    parser.add_argument("--experiment_name", default="ca+dp_ctr", type=str)
    # model
    parser.add_argument("--num_queries", default=100, type=int)
    parser.add_argument("--visual_backbone", type=int, default=50)
    parser.add_argument("--seg_model", type=str, default="DeepLabV3Plus")
    parser.add_argument("--use_baseline", default=False, action="store_true")
    # data
    parser.add_argument("--semi_ratio", default="1/1", type=str)
    parser.add_argument("--setup", default="coco", type=str)
    parser.add_argument("--use_synthetic", default=False, action="store_true")
    # flags
    parser.add_argument("--cavp_flag", default=False, action="store_true")
    parser.add_argument("--cutmix_flag", default=False, action="store_true")
    parser.add_argument("--resize_flag", default=False, action="store_true")
    # optimisation
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--lr_power", default=0.9, type=float)
    parser.add_argument("--lr", default=0.02, type=float)
    parser.add_argument("--lr_aud", default=1e-4, type=float)
    parser.add_argument("--lrs_seg", default=10, type=float)
    parser.add_argument("--lrs_bkb", default=0.5, type=float)
    parser.add_argument("--weight_decay", default=1e-4, type=float)
    parser.add_argument("--epochs", default=60, type=int)
    parser.add_argument("--loss_w", default=0.1, type=float)
    # mode
    parser.add_argument("--ignore_ckpt", default=False, action="store_true")
    parser.add_argument("--local", default=False, action="store_true")
    parser.add_argument("--use_multi_source", default=False, action="store_true")
    parser.add_argument("--debug", default=False, action="store_true")
    parser.add_argument("--ow_rate", default=0.5, type=float)
    # model hyper
    parser.add_argument("--cl_temp", default=0.1, type=float)
    parser.add_argument("--corocl_w", default=1.0, type=float,
                        help="CoroCL weight (reference: unweighted, =1); "
                             "0 disables the contrastive objective")
    parser.add_argument("--max_view", default=512, type=int)
    # avsbench
    parser.add_argument("--avsbench_split", default="all", type=str)
    parser.add_argument("--data_root", default="", type=str)
    parser.add_argument("--root_dataset_dir", default=None, type=str,
                        help="override the dataset root (avsbench_semantic "
                             "parent dir)")
    # TPU-native extras (no reference equivalent)
    parser.add_argument("--compute_dtype", default="bfloat16", type=str,
                        choices=["bfloat16", "float32"])
    parser.add_argument("--class_slots", default=16, type=int,
                        help="static class budget per batch for CoroCL sampling")
    parser.add_argument("--use_tfdata", default=False, action="store_true",
                        help="tf.data eval input pipeline")
    parser.add_argument("--eval_list_path", default="", type=str,
                        help="eval_list.txt of video uids whitelisted for "
                             "wandb image upload during validation")
    parser.add_argument("--use_pallas_mel", default=False, action="store_true",
                        help="use the fused Pallas log-mel kernel")
    parser.add_argument("--use_pallas_fusion", default=False,
                        action="store_true",
                        help="use the fused Pallas visual-fusion kernel on "
                             "the eval path")
    parser.add_argument("--use_pallas_fusion_train", default=False,
                        action="store_true",
                        help="use the fused Pallas visual-fusion kernel "
                             "(fwd + custom-VJP bwd) on the train path")
    parser.add_argument("--fused_optimizer", default=False,
                        action="store_true",
                        help="hand-fused single-pass optimizer with the "
                             "exact multi_transform semantics "
                             "(engine/optim.py fused_optimizer)")
    parser.add_argument("--use_pallas_layer1", default=False,
                        action="store_true",
                        help="fused Pallas residual-stage kernel for the "
                             "visual tower's layer1 on the eval path "
                             "(ops/pallas/layer1_kernel.py)")
    parser.add_argument("--use_pallas_argmax", default=False,
                        action="store_true",
                        help="fused upsample+argmax kernel on the eval "
                             "metric path (measured slower in-context; "
                             "see docs/performance.md)")
    parser.add_argument("--no_dilated_taps", dest="dilated_taps",
                        default=True, action="store_false",
                        help="disable the exact tap-matmul decomposition "
                             "of heavily-dilated 3x3 convs (ops/dilated.py)")
    parser.add_argument("--no_audio_dedup", dest="audio_dedup",
                        default=True, action="store_false",
                        help="disable the exact train-path audio-tower "
                             "dedup (tower on B+K clips instead of 2B; "
                             "avss/VGG only)")
    parser.add_argument("--fusion_mlp_dedup", default=False,
                        action="store_true",
                        help="exact decomposed-MLP dedup in the fusion "
                             "block's train path (fc1 on B instead of "
                             "2B) — measured -4.2%% in context, kept "
                             "opt-in as a recorded negative")
    parser.add_argument("--s2_phase_bwd", default=False,
                        action="store_true",
                        help="phase-decomposed input-gradient for "
                             "stride-2 3x3 convs (ops/stride2.py; "
                             "opt-in pending the chip A/B)")
    parser.add_argument("--ckpt_path", default="", type=str,
                        help="checkpoint to load (orbax dir or torch .pth)")
    parser.add_argument("--compiler_options", default="", type=str,
                        help="k=v,k=v XLA options forwarded per-compile "
                             "(TPU flags must use this, not XLA_FLAGS)")
    return parser


# Config fields that the setup modules own; only explicitly-passed CLI
# values may override them (reference: EasyDict config merged first,
# argparse vars() second -- but argparse defaults for these were chosen
# to match the configs, so honoring "explicit only" reproduces intent).
_SETUP_OWNED = {
    "lr", "epochs", "batch_size", "weight_decay", "num_workers",
    "visual_backbone", "lr_power",
}


def _explicit_flags(argv: Sequence[str]) -> set:
    out = set()
    for tok in argv:
        if tok.startswith("--"):
            out.add(tok[2:].split("=")[0])
    return out


def load_args_and_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Parse CLI + merge onto the setup config (reference load_args_and_config)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = get_config(args.setup)
    explicit = _explicit_flags(argv)

    field_names = {f.name for f in dataclasses.fields(Config)}
    updates = {}
    for key, value in vars(args).items():
        if key not in field_names:
            continue
        if key in _SETUP_OWNED and key not in explicit:
            continue  # setup config owns this value
        if value is None and key not in explicit:
            continue  # None-default flags only apply when passed
        updates[key] = value
    if isinstance(updates.get("tags"), str):
        updates["tags"] = [updates["tags"]] if updates["tags"] else []
    cfg = cfg.replace(**updates)

    # Derived adjustments, mirroring the reference entry points:
    #   lr *= gpus (main_avss.py:214) and num_classes pinning.
    cfg = cfg.replace(lr=cfg.lr * cfg.gpus)
    if cfg.setup in ("avss",) and cfg.avsbench_split == "all":
        cfg = cfg.replace(num_classes=71)
    if cfg.use_vpo:
        cfg = cfg.replace(num_classes=cfg.vpo_num_classes)
    if cfg.debug:
        cfg = cfg.replace(wandb_mode="disabled", experiment_name="dummpy_test")
    return cfg
