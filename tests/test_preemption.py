"""Graceful preemption: SIGTERM -> resumable mid-training checkpoint.

SURVEY.md §5.3: the reference has no failure handling. Two layers:

- a real SIGTERM sets the PreemptionSignal flag (signal delivery);
- a deterministic count-based trigger preempts the live epoch loop
  after exactly N step-boundary checks — the loop writes a full-state
  ``preempt`` checkpoint and raises; ``--ckpt_path .../preempt``
  resumes from the saved step. (A timed real signal races with the
  setup compiles on slow hosts, so the mid-training proof is
  deterministic instead.)
"""

import os
import signal
import tempfile
import time

import numpy as np
import pytest

from cavp_tpu.config import get_config
from cavp_tpu.data.avss import AVSSDataset
from cavp_tpu.data.synthetic import make_synthetic_avss


@pytest.fixture(scope="module")
def synthetic_root():
    tmp = tempfile.mkdtemp(prefix="cavp_preempt_")
    return make_synthetic_avss(tmp, num_videos=4, image_size=48,
                               num_classes=6)


def _cfg(**kw):
    return get_config("avss").replace(
        image_width=48, image_height=48, num_classes=6, batch_size=2,
        max_view=8, class_slots=2, num_workers=2,
        compute_dtype="float32", visual_backbone=18, ignore_ckpt=True,
        **kw)


def _make_datasets_factory(root):
    def make_datasets(config):
        from cavp_tpu.data.pipeline import collate_train_videos

        train = AVSSDataset(config, "train", dir_base=root)
        test = AVSSDataset(config, "test", dir_base=root)
        return train, test, collate_train_videos

    return make_datasets


class _TriggerAfter:
    """PreemptionSignal-compatible: fires after N step-boundary checks
    (deterministic mid-training preemption)."""

    def __init__(self, n: int):
        self._n = n

    @property
    def triggered(self) -> bool:
        self._n -= 1
        return self._n < 0

    def install(self):
        return self

    def uninstall(self):
        pass


class TestPreemption:
    def test_sigterm_sets_flag(self):
        from cavp_tpu.engine.runner import PreemptionSignal

        p = PreemptionSignal().install()
        try:
            assert not p.triggered
            os.kill(os.getpid(), signal.SIGTERM)
            for _ in range(50):
                if p.triggered:
                    break
                time.sleep(0.05)
            assert p.triggered
        finally:
            p.uninstall()

    def test_preempt_mid_training_checkpoints_and_resumes(
            self, synthetic_root):
        from cavp_tpu.engine.runner import PreemptedError, run_training

        ckpt_dir = tempfile.mkdtemp(prefix="preempt_ckpt_")
        cfg = _cfg(epochs=500)

        with pytest.raises(PreemptedError):
            run_training(cfg, "avss",
                         _make_datasets_factory(synthetic_root),
                         ckpt_dir=ckpt_dir, max_steps_per_epoch=2,
                         preempt=_TriggerAfter(3))

        ckpt = os.path.join(ckpt_dir, "preempt")
        assert os.path.isdir(ckpt), os.listdir(ckpt_dir)

        from cavp_tpu.engine.checkpoint import restore_checkpoint

        payload = restore_checkpoint(ckpt)
        saved_step = int(np.asarray(payload["step"]))
        assert saved_step == 3

        # resume: restores the saved step and keeps training
        cfg2 = _cfg(epochs=(saved_step // 2) + 1, ckpt_path=ckpt)
        state, best = run_training(
            cfg2, "avss", _make_datasets_factory(synthetic_root),
            ckpt_dir=tempfile.mkdtemp(), max_steps_per_epoch=2)
        assert int(state.step) > saved_step
        assert np.isfinite(best)
