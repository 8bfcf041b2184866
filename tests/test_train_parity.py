"""End-to-end TRAIN-STEP parity: assembled torch CAVP vs the flax
rebuild through real multi-group optimizer steps (VERDICT round-2 #1).

Two layers of proof:

1. ``TestTrainStepParityFp32`` (in-process): one production train step
   through the *waveform* path — pins the trainer-side composition that
   the fp64 driver bypasses (in-step mel of the matched ‖ shuffled
   concat, shuffle-wave gather) at fp32 loss tolerance.

2. ``TestTrainStepParityFp64`` (subprocess — x64 is process-global):
   3 real optimizer steps in float64, where gradient-cancellation noise
   is ~1e-10 and any *systematic* composition error stands out:

   - after step 1, every parameter delta must match to 1e-4 (measured
     headroom ~6e-7, worst = Adam near-zero-gradient coords) and every
     BN running stat to 1e-6 (measured ~9e-9);
   - over 3 steps, the loss trajectory matches to 1e-6 and deltas to
     1% (trajectory chaos through ReLU-gate flips grows the
     cross-framework gap exponentially; measured ~1.6e-3 at step 3).

   A wrong stop-gradient, optimizer-group assignment, decay split,
   LR indexing (the update-after-step lag), or BN-update placement
   anywhere in the composition fails these gates by orders of
   magnitude.

Composition covered: SGD over the reference's 12-group structure (8
seg groups at lr x10 with group_weight decay/no-decay, backbone
decay/no-decay, plain projector/cross-att groups that decay
everything), Adam on the audio tower, WarmUpPolyLR, train-mode
(Sync)BN stat updates, CE + CoroCL gradients through sigmoid-CA +
ASPP + deep stem. See tests/train_parity_common.py for why the CoroCL
sampling is exhaustive-by-construction (the determinism trick).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cavp_tpu.config.setups import get_config
from cavp_tpu.engine.convert import import_torch_state_dict
from cavp_tpu.engine.loops import make_train_step
from cavp_tpu.engine.loops import preprocess_audio as flax_mel
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import TrainState
from cavp_tpu.models.cavp import CAVP
from cavp_tpu.models.soundbank import init_bank

from torch_ref import TorchCAVP, randomize_bn_stats
from torch_train_ref import (TorchCoroCL, WarmUpPolyLR,
                             build_reference_optimizers,
                             reference_train_step)
from train_parity_common import (B, MAX_VIEWS, NUM_CLASSES, SPE,
                                 build_batch, make_test_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestTrainStepParityFp32:
    def test_step0_losses_via_waveform_path(self):
        """Production step incl. in-step mel: CE + CoroCL match torch
        on the first step (identical initial params)."""
        torch.manual_seed(0)
        tmodel = TorchCAVP(num_classes=NUM_CLASSES)
        randomize_bn_stats(tmodel, seed=1)
        cfg = make_test_config(get_config)

        fmodel = CAVP(num_classes=NUM_CLASSES, cls_matched_only=False)
        variables = fmodel.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3), jnp.float32),
                                jnp.zeros((1, 96, 64, 1), jnp.float32), True)
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        params, batch_stats, report = import_torch_state_dict(
            sd, variables["params"], variables["batch_stats"])
        assert report["missing"] == []

        tx, _ = make_optimizer(cfg, steps_per_epoch=SPE)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=tx.init(params),
                           sound_bank=init_bank(NUM_CLASSES, B,
                                                cfg.audio_samples))
        train_step = jax.jit(make_train_step(fmodel, tx, cfg,
                                             variant="avss"))

        batch = build_batch(seed=0)
        # torch side consumes the flax mel (frontend parity has its own
        # golden tests); the flax step recomputes it from the waveform —
        # this is exactly the wiring under test here
        mel = flax_mel(jnp.asarray(np.concatenate(
            [batch["waveform"], batch["waveform"][batch["shuffle_idx"]]],
            0)), n_frames=cfg.mel_frames, spec_min=cfg.spec_min,
            spec_max=cfg.spec_max)
        corocl = TorchCoroCL(temperature=cfg.cl_temp, max_views=MAX_VIEWS)
        opt_v, opt_a = build_reference_optimizers(
            tmodel, cfg.lr, cfg.momentum, cfg.weight_decay)
        sched = WarmUpPolyLR(cfg.lr, cfg.lr_power, SPE * cfg.epochs,
                             SPE * cfg.warm_up_epoch)
        t_loss = reference_train_step(
            tmodel, corocl, opt_v, opt_a, sched, cur_iter=0,
            image=torch.from_numpy(batch["image"]).permute(0, 3, 1, 2),
            mel_2b=torch.from_numpy(np.asarray(mel).copy()
                                    ).permute(0, 3, 1, 2).contiguous(),
            pix_label=torch.from_numpy(batch["pix_label"]).long(),
            img_label=torch.from_numpy(batch["img_label"]).long(),
            shuffle_idx=torch.from_numpy(batch["shuffle_idx"]).long())

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, metrics = train_step(state, jb, jax.random.PRNGKey(7),
                                jnp.int32(0))
        f_loss = (float(metrics["loss/loss"]),
                  float(metrics["loss/cross_entropy"]),
                  float(metrics["loss/l_ctr_av"]))
        np.testing.assert_allclose(f_loss, t_loss, rtol=1e-3, atol=1e-3)


def _run_fp64_driver(variant: str, steps: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PARITY_STEPS"] = str(steps)
    env["PARITY_VARIANT"] = variant
    r = subprocess.run(
        [sys.executable, os.path.join("tests", "_train_parity_fp64.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


class TestTrainStepParityFp64:
    @pytest.fixture(scope="class")
    def report(self):
        return _run_fp64_driver("avss", 3)

    def test_loss_trajectory(self, report):
        for s, (t, f) in enumerate(zip(report["t_losses"],
                                       report["f_losses"])):
            np.testing.assert_allclose(f, t, rtol=1e-6, atol=1e-6,
                                       err_msg=f"step {s}")

    def test_step1_deltas_tight(self, report):
        """The composition pin: one full optimizer step in f64 must
        reproduce every parameter delta to 1e-4 (measured ~6e-7)."""
        worst = report["step1"]["worst_params"]
        assert worst and worst[0][0] < 1e-4, worst[:5]
        worst_bn = report["step1"]["worst_bn"]
        assert worst_bn and worst_bn[0][0] < 1e-6, worst_bn
        assert report["step1"]["frozen_moved"] == []

    def test_trajectory_deltas(self, report):
        """3-step trajectory: bounded chaotic divergence only."""
        worst = report["final"]["worst_params"]
        assert worst and worst[0][0] < 1e-2, worst[:5]
        worst_bn = report["final"]["worst_bn"]
        assert worst_bn and worst_bn[0][0] < 1e-4, worst_bn
        assert report["final"]["frozen_moved"] == []

    def test_every_group_moved(self, report):
        for group, delta in report["moved_probes"].items():
            assert delta > 1e-7, f"{group} group did not move"


class TestTrainStepParityFp64Stereo:
    """The vpo_stereo trainer variant (trainer_cavp_vpo_stereo.py):
    stereo 2-channel 3-s mel, ResNet-18 audio tower, and the
    ``audio_func=True`` convention — the tower runs on the B unshuffled
    clips and the shuffled half is the feature gather fea_a[idx]
    (cavp_model.py:156-173 with the dead bank overwrite). Also pins the
    flax AudioResNet18 numerics against the inline torchvision replica
    through real gradients."""

    @pytest.fixture(scope="class")
    def report(self):
        return _run_fp64_driver("vpo_stereo", 2)

    def test_loss_trajectory(self, report):
        for s, (t, f) in enumerate(zip(report["t_losses"],
                                       report["f_losses"])):
            np.testing.assert_allclose(f, t, rtol=1e-6, atol=1e-6,
                                       err_msg=f"step {s}")

    def test_step1_deltas_tight(self, report):
        worst = report["step1"]["worst_params"]
        assert worst and worst[0][0] < 1e-4, worst[:5]
        worst_bn = report["step1"]["worst_bn"]
        assert worst_bn and worst_bn[0][0] < 1e-6, worst_bn
        assert report["step1"]["frozen_moved"] == []

    def test_every_group_moved(self, report):
        for group, delta in report["moved_probes"].items():
            assert delta > 1e-7, f"{group} group did not move"


class TestTrainStepParityFp64Binary:
    """The binary S4/MS3 setting (trainer_cavp_avs_obj.py train loop,
    driven by main_avss.py with setup=avss_binary): same hot-loop math
    as avss but with the sound-bank and overwrite plumbing gated OFF by
    the setup (engine/loops.py use_wave_bank/use_overwrite). Measures —
    rather than argues — that the setup gates leave the epoch-0 step's
    parameter updates exactly on the torch trajectory (the second half
    of VERDICT r3 next-round item #5)."""

    @pytest.fixture(scope="class")
    def report(self):
        return _run_fp64_driver("avss_binary", 2)

    def test_loss_trajectory(self, report):
        for s, (t, f) in enumerate(zip(report["t_losses"],
                                       report["f_losses"])):
            np.testing.assert_allclose(f, t, rtol=1e-6, atol=1e-6,
                                       err_msg=f"step {s}")

    def test_step1_deltas_tight(self, report):
        worst = report["step1"]["worst_params"]
        assert worst and worst[0][0] < 1e-4, worst[:5]
        worst_bn = report["step1"]["worst_bn"]
        assert worst_bn and worst_bn[0][0] < 1e-6, worst_bn
        assert report["step1"]["frozen_moved"] == []

    def test_every_group_moved(self, report):
        for group, delta in report["moved_probes"].items():
            assert delta > 1e-7, f"{group} group did not move"


class TestTrainStepParityFp64Mono:
    """The vpo_mono trainer variant (trainer_cavp_vpo_mono.py:30-308):
    mono 3-s clips -> 300-frame mel -> ResNet-18 audio tower, the
    avss-style audio_func=False 2B waveform concat, bank/overwrite
    plumbing present but epoch>=1-gated (inert at this epoch-0 drive,
    matching the reference's gates at :132,155). Converts ROADMAP's
    'shares the avss composition' argument into a measurement
    (VERDICT r3 next-round item #5)."""

    @pytest.fixture(scope="class")
    def report(self):
        return _run_fp64_driver("vpo_mono", 2)

    def test_loss_trajectory(self, report):
        for s, (t, f) in enumerate(zip(report["t_losses"],
                                       report["f_losses"])):
            np.testing.assert_allclose(f, t, rtol=1e-6, atol=1e-6,
                                       err_msg=f"step {s}")

    def test_step1_deltas_tight(self, report):
        worst = report["step1"]["worst_params"]
        assert worst and worst[0][0] < 1e-4, worst[:5]
        worst_bn = report["step1"]["worst_bn"]
        assert worst_bn and worst_bn[0][0] < 1e-6, worst_bn
        assert report["step1"]["frozen_moved"] == []

    def test_every_group_moved(self, report):
        for group, delta in report["moved_probes"].items():
            assert delta > 1e-7, f"{group} group did not move"
