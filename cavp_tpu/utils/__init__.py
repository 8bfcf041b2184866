from cavp_tpu.utils.wandb_logger import (
    Tensorboard,
    colorize_mask,
    logger,
    suppress_non_primary,
)

__all__ = ["Tensorboard", "colorize_mask", "logger", "suppress_non_primary"]
