from cavp_tpu.engine.checkpoint import (
    Engine,
    load_model_variables,
    restore_checkpoint,
    save_and_link_checkpoint,
    save_checkpoint,
)
from cavp_tpu.engine.loops import (
    EvalMetrics,
    eval_metrics_init,
    eval_metrics_result,
    make_eval_step,
    make_jf_test_step,
    make_train_step,
)
from cavp_tpu.engine.optim import current_lrs, make_optimizer
from cavp_tpu.engine.schedules import (
    linear_increase_schedule,
    multistage_schedule,
    poly_schedule,
    warmup_poly_schedule,
)
from cavp_tpu.engine.state import TrainState, create_train_state

__all__ = [
    "Engine",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_jf_test_step",
    "EvalMetrics",
    "eval_metrics_init",
    "eval_metrics_result",
    "make_optimizer",
    "current_lrs",
    "warmup_poly_schedule",
    "poly_schedule",
    "multistage_schedule",
    "linear_increase_schedule",
    "save_checkpoint",
    "save_and_link_checkpoint",
    "restore_checkpoint",
    "load_model_variables",
]
