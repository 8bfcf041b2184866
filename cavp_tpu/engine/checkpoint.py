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
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

_save_thread: Optional[threading.Thread] = None
_save_error: Optional[BaseException] = None


def _checkpointer():
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # The runner saves on the primary process only, but orbax's
        # default save() opens a barrier over ALL jax processes
        # (Checkpointer.save -> multihost.sync_global_processes) — a
        # single-rank save would deadlock the pod. Scope every barrier
        # to this process: the payload is host numpy (a full replica),
        # so a local single-process write is exactly right.
        me = jax.process_index()
        mp = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"cavp-proc{me}")
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
            multiprocessing_options=mp)
    return ocp.PyTreeCheckpointer()


def _atomic_save(path: str, payload) -> None:
    """Write to a sibling ``.pending`` dir, then swap it into place. The
    previous checkpoint stays on disk until the new one is complete, so
    a crash mid-write (or a killed async thread) can never lose the last
    good checkpoint — orbax's ``force=True`` would instead delete the
    old directory before writing."""
    pending = path + ".pending"
    if os.path.exists(pending):
        shutil.rmtree(pending)
    _checkpointer().save(pending, payload)
    backup = path + ".old"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(pending, path)
    shutil.rmtree(backup, ignore_errors=True)


def wait_for_saves(raise_error: bool = True):
    """Block until any in-flight async checkpoint write has finished.
    A failed write's exception is re-raised (``raise_error=True``, the
    default — used by the runner and by subsequent saves) or logged and
    left pending (``raise_error=False`` — used by restore_checkpoint so
    a stale write failure of one path is not misattributed to a restore
    of another)."""
    global _save_thread, _save_error
    if _save_thread is not None:
        _save_thread.join()
        _save_thread = None
    if _save_error is not None:
        if raise_error:
            err, _save_error = _save_error, None
            raise err
        import logging

        logging.getLogger("cavp_tpu").warning(
            "pending async checkpoint write failed: %r", _save_error)


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None,
                    blocking: bool = True):
    """Write {params, batch_stats, opt_state, step, sound_bank} (+extras).

    Mirrors Engine.save_checkpoint's payload {model, visual_optimizer,
    audio_optimizer, epoch, iteration} (engine/engine.py:72-100).

    ``blocking=False`` moves the orbax serialization/file write to a
    background thread so training continues while the checkpoint lands.
    The device→host transfer stays synchronous on purpose: the runner's
    train step donates the state buffers (``donate_argnums=(0,)``), so a
    thread holding *device* array references would read deleted buffers
    once the next step runs — host numpy copies have no such hazard.
    At most one write is in flight: a new save first joins the previous
    one (and surfaces its error, if any).
    """
    path = os.path.abspath(path)
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

    wait_for_saves()
    if blocking:
        _atomic_save(path, payload)
        return path

    global _save_thread, _save_error

    def _runner():
        global _save_error
        try:
            _atomic_save(path, payload)
        except BaseException as exc:  # surfaced by the next wait/save
            _save_error = exc

    _save_thread = threading.Thread(target=_runner, daemon=True,
                                    name="ckpt-save")
    _save_thread.start()
    return path


def save_and_link_checkpoint(ckpt_dir: str, name: str, state,
                             extra: Optional[Dict[str, Any]] = None,
                             blocking: bool = True) -> str:
    """engine/engine.py:107-112: save + maintain an ``epoch-last`` alias.
    With ``blocking=False`` the alias is created immediately and points
    at the in-flight write; call :func:`wait_for_saves` before reading."""
    path = save_checkpoint(os.path.join(ckpt_dir, name), state, extra,
                           blocking=blocking)
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
    # join (not raise): a stale failure of some other path's async write
    # must not masquerade as a failure of THIS restore
    wait_for_saves(raise_error=False)
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
    # strict-with-report for orbax too: a checkpoint saved under a
    # different config must fail HERE with key/shape names, not later
    # with an opaque XLA shape error (or silently serve wrong weights)
    def _flat(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp):
            np.shape(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    report = {"missing": [], "unexpected": [], "converted": ["<orbax>"]}
    for name, have, want in (("params", payload["params"], params),
                             ("batch_stats", payload["batch_stats"],
                              batch_stats)):
        fh, fw = _flat(have), _flat(want)
        report["missing"] += [f"{name}/{k}" for k in fw if k not in fh]
        report["unexpected"] += [
            f"{name}/{k}" for k, s in fh.items()
            if k not in fw or fw[k] != s]
    return payload["params"], payload["batch_stats"], report


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

    def save(self, state, name: Optional[str] = None,
             blocking: bool = True,
             extra_metrics: Optional[Dict[str, Any]] = None) -> str:
        name = name or f"epoch-{self.epoch}"
        extra = {"epoch": self.epoch, "iteration": self.iteration}
        if extra_metrics:
            extra.update(extra_metrics)
        return save_and_link_checkpoint(
            self.ckpt_dir, name, state, extra=extra, blocking=blocking)
