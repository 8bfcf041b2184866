"""Orbax checkpoint save/restore round-trip + Engine alias handling."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cavp_tpu.engine.checkpoint import (
    Engine,
    restore_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from cavp_tpu.engine.state import TrainState


@pytest.fixture
def tiny_state():
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros(3)}}
    bs = {"layer": {"mean": jnp.ones(3), "var": jnp.full(3, 2.0)}}
    return TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                      batch_stats=bs, opt_state={"mu": jnp.zeros((2, 3))},
                      sound_bank=jnp.ones((4, 2, 5)))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tiny_state):
        d = tempfile.mkdtemp()
        path = save_checkpoint(os.path.join(d, "ck"), tiny_state)
        payload = restore_checkpoint(path)
        assert payload["step"] == 7
        np.testing.assert_array_equal(
            np.asarray(payload["params"]["layer"]["kernel"]),
            np.arange(6.0).reshape(2, 3))
        np.testing.assert_array_equal(
            np.asarray(payload["sound_bank"]), np.ones((4, 2, 5)))

    def test_engine_epoch_last_alias(self, tiny_state):
        d = tempfile.mkdtemp()
        engine = Engine(config=None, ckpt_dir=d)
        engine.update_iteration(3, 42)
        engine.save(tiny_state)
        link = os.path.join(d, "epoch-last")
        assert os.path.exists(link)
        payload = restore_checkpoint(os.path.realpath(link))
        assert payload["extra"]["epoch"] == 3
        assert payload["extra"]["iteration"] == 42
        # second save repoints the alias
        engine.update_iteration(4, 50)
        engine.save(tiny_state)
        payload = restore_checkpoint(os.path.realpath(link))
        assert payload["extra"]["epoch"] == 4

    def test_orbax_load_model_variables_reports_mismatch(self, tiny_state):
        """The orbax branch must be strict-with-report like the torch
        branch: a checkpoint saved under a different config surfaces
        key/shape mismatches instead of an opaque downstream error."""
        from cavp_tpu.engine.checkpoint import load_model_variables

        d = tempfile.mkdtemp()
        path = save_checkpoint(os.path.join(d, "ck"), tiny_state)
        # matching templates -> clean report
        _, _, rep = load_model_variables(
            path, tiny_state.params, tiny_state.batch_stats)
        assert not rep["missing"] and not rep["unexpected"]
        # wrong-shaped template -> flagged
        bad = {"layer": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(3)}}
        _, _, rep = load_model_variables(path, bad, tiny_state.batch_stats)
        assert any("kernel" in k for k in rep["unexpected"]), rep
        # extra template leaf -> missing
        extra = dict(tiny_state.params)
        extra["other"] = {"w": jnp.zeros(2)}
        _, _, rep = load_model_variables(path, extra,
                                         tiny_state.batch_stats)
        assert any("other" in k for k in rep["missing"]), rep

    def test_async_save_roundtrip(self, tiny_state):
        d = tempfile.mkdtemp()
        path = save_checkpoint(os.path.join(d, "ck"), tiny_state,
                               blocking=False)
        # restore_checkpoint joins the in-flight write internally
        payload = restore_checkpoint(path)
        assert payload["step"] == 7
        np.testing.assert_array_equal(
            np.asarray(payload["params"]["layer"]["kernel"]),
            np.arange(6.0).reshape(2, 3))

    def test_async_save_error_surfaces(self, tiny_state, monkeypatch):
        import cavp_tpu.engine.checkpoint as ck

        class Boom:
            def save(self, *a, **k):
                raise RuntimeError("disk full")

        monkeypatch.setattr(ck, "_checkpointer", lambda: Boom())
        save_checkpoint("/tmp/ck-err", tiny_state, blocking=False)
        with pytest.raises(RuntimeError, match="disk full"):
            wait_for_saves()
        # error is consumed; subsequent waits are clean
        wait_for_saves()

    def test_failed_overwrite_preserves_previous_checkpoint(
            self, tiny_state, monkeypatch):
        """Atomic swap: the previous best_model must survive a failed
        (or killed) re-save — orbax force=True would delete it first."""
        import cavp_tpu.engine.checkpoint as ck

        d = tempfile.mkdtemp()
        path = save_checkpoint(os.path.join(d, "best"), tiny_state)
        before = restore_checkpoint(path)["step"]

        real = ck._checkpointer

        class Boom:
            def save(self, *a, **k):
                raise RuntimeError("crashed mid-write")

        monkeypatch.setattr(ck, "_checkpointer", lambda: Boom())
        with pytest.raises(RuntimeError, match="crashed mid-write"):
            save_checkpoint(path, tiny_state)
        monkeypatch.setattr(ck, "_checkpointer", real)
        # the old checkpoint is fully intact and restorable
        assert restore_checkpoint(path)["step"] == before

    def test_restore_does_not_raise_stale_async_error(
            self, tiny_state, monkeypatch):
        """A stale failure from some OTHER path's async write must not
        masquerade as a failure of this restore (it is logged and stays
        pending for the next explicit wait)."""
        import cavp_tpu.engine.checkpoint as ck

        d = tempfile.mkdtemp()
        good = save_checkpoint(os.path.join(d, "ok"), tiny_state)

        real = ck._checkpointer

        class Boom:
            def save(self, *a, **k):
                raise RuntimeError("disk full")

        monkeypatch.setattr(ck, "_checkpointer", lambda: Boom())
        save_checkpoint(os.path.join(d, "other"), tiny_state,
                        blocking=False)
        ck._save_thread.join()  # let the failing write land its error
        monkeypatch.setattr(ck, "_checkpointer", real)
        payload = restore_checkpoint(good)  # must not raise
        assert payload["step"] == 7
        with pytest.raises(RuntimeError, match="disk full"):
            wait_for_saves()  # still surfaced at an explicit wait
