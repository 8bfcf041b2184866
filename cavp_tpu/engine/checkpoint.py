"""Native checkpoint save/load (orbax) + run-state Engine.

Rebuilds ``engine/engine.py:34-121``: the Engine run-state registry,
``save_checkpoint`` / ``save_and_link_checkpoint`` (keeps an
``epoch-last`` alias), and checkpoint loading — with orbax as the
storage layer (atomic, async-capable, sharding-aware) instead of
``torch.save``, giving resume-after-preemption for free (the reference
has no auto-resume; SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None):
    """Write {params, batch_stats, opt_state, step, sound_bank} (+extras).

    Mirrors Engine.save_checkpoint's payload {model, visual_optimizer,
    audio_optimizer, epoch, iteration} (engine/engine.py:72-100).
    """
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    if state.sound_bank is not None:
        payload["sound_bank"] = jax.device_get(state.sound_bank)
    if extra:
        payload["extra"] = extra
    path = os.path.abspath(path)
    _checkpointer().save(path, payload, force=True)
    return path


def save_and_link_checkpoint(ckpt_dir: str, name: str, state,
                             extra: Optional[Dict[str, Any]] = None) -> str:
    """engine/engine.py:107-112: save + maintain an ``epoch-last`` alias."""
    path = save_checkpoint(os.path.join(ckpt_dir, name), state, extra)
    link = os.path.join(ckpt_dir, "epoch-last")
    if os.path.islink(link) or os.path.exists(link):
        try:
            os.remove(link)
        except OSError:
            import shutil

            shutil.rmtree(link, ignore_errors=True)
    os.symlink(path, link)
    return path


def restore_checkpoint(path: str) -> Dict[str, Any]:
    return _checkpointer().restore(os.path.abspath(path))


def load_model_variables(path: str, params, batch_stats,
                         seg_model: str = "DeepLabV3Plus"):
    """Load either an orbax dir or a torch .pth into model variables.

    The .pth branch is the parity path for the reference's released
    checkpoints (``test_avs_semantic.py:204-207``).
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        from cavp_tpu.engine.convert import (
            import_torch_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        params, batch_stats, report = import_torch_state_dict(
            sd, jax.device_get(params), jax.device_get(batch_stats),
            seg_model=seg_model)
        return params, batch_stats, report
    payload = restore_checkpoint(path)
    return payload["params"], payload["batch_stats"], {
        "missing": [], "unexpected": [], "converted": ["<orbax>"]}


class Engine:
    """Run-state holder (engine/engine.py:17-121) — epoch/iteration
    bookkeeping + checkpoint directory management. The heavy lifting
    (params, optimizer) lives in the functional TrainState."""

    def __init__(self, config, ckpt_dir: str = "./checkpoints"):
        self.config = config
        self.ckpt_dir = ckpt_dir
        self.epoch = 0
        self.iteration = 0
        os.makedirs(ckpt_dir, exist_ok=True)

    def update_iteration(self, epoch: int, iteration: int):
        self.epoch = epoch
        self.iteration = iteration

    def save(self, state, name: Optional[str] = None) -> str:
        name = name or f"epoch-{self.epoch}"
        return save_and_link_checkpoint(
            self.ckpt_dir, name, state,
            extra={"epoch": self.epoch, "iteration": self.iteration})
