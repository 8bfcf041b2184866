"""fp64 train-step parity driver (run as a subprocess by
tests/test_train_parity.py — x64 is a process-global jax flag, so it
cannot run inside the normal f32 test session).

Both frameworks start from the identical f32-representable weights
(converted at f32, then exactly upcast to double) and step in float64,
where gradient-cancellation noise drops to ~1e-10 and any *systematic*
composition error — wrong stop-gradient, optimizer group, decay split,
LR indexing, BN-update placement — stands out by orders of magnitude.
The shared mel (f32 frontend output, upcast) is injected into both
sides; mel parity has its own golden tests (tests/test_audio_mel.py).

Prints one JSON line: losses per step, worst param-delta / BN-stat
relative errors, and the offending keys.
"""

import json
import os
import sys

# hard-set (not setdefault): the session env pins axon, and importing
# cavp_tpu re-applies the env var through the config API (CLAUDE.md) —
# x64 maxpool backward doesn't even compile on TPU
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
from cavp_tpu.utils.hostfp import cache_dir as _hostfp_dir
jax.config.update("jax_compilation_cache_dir", _hostfp_dir("/tmp/jax_test_cache"))
import jax.numpy as jnp

from cavp_tpu.config.setups import get_config
from cavp_tpu.engine.convert import (export_torch_state_dict,
                                     import_torch_state_dict)
from cavp_tpu.engine.loops import make_train_step, preprocess_audio as flax_mel
from cavp_tpu.engine.optim import make_optimizer
from cavp_tpu.engine.state import TrainState
from cavp_tpu.models.cavp import CAVP
from cavp_tpu.models.soundbank import init_bank

from torch_ref import TorchCAVP, randomize_bn_stats
from torch_train_ref import (TorchCoroCL, WarmUpPolyLR,
                             build_reference_optimizers,
                             reference_train_step,
                             reference_train_step_stereo)
from train_parity_common import (B, MAX_VIEWS, NUM_CLASSES, SPE,
                                 build_batch, make_test_config, rel_err)

STEPS = int(os.environ.get("PARITY_STEPS", "3"))
VARIANT = os.environ.get("PARITY_VARIANT", "avss")


def main():
    stereo = VARIANT == "vpo_stereo"
    cfg = make_test_config(get_config, variant=VARIANT)
    torch.manual_seed(0)
    tmodel = TorchCAVP(num_classes=NUM_CLASSES,
                       audio_backbone=cfg.audio_backbone,
                       in_plane=cfg.in_plane)
    randomize_bn_stats(tmodel, seed=1)
    sd0_f32 = {k: v.detach().clone().numpy() for k, v in
               tmodel.state_dict().items()}

    # convert at f32 (exact copy), then upcast both sides to double
    fmodel = CAVP(num_classes=NUM_CLASSES, cls_matched_only=False,
                  audio_backbone=cfg.audio_backbone, in_plane=cfg.in_plane,
                  dtype=jnp.float64)
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3), jnp.float32),
                            jnp.zeros((1, cfg.mel_frames, 64, cfg.in_plane),
                                      jnp.float32), True)
    params, batch_stats, report = import_torch_state_dict(
        sd0_f32, variables["params"], variables["batch_stats"])
    assert report["missing"] == [], report["missing"][:10]
    as64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
    params, batch_stats = as64(params), as64(batch_stats)
    tmodel = tmodel.double()

    tx, _ = make_optimizer(cfg, steps_per_epoch=SPE)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       sound_bank=init_bank(NUM_CLASSES, B,
                                            cfg.audio_samples))
    # avss_binary is the avss step with setup-gated bank/overwrite off
    # (main_avss.py drives it with variant="avss"; the config carries
    # setup="avss_binary")
    step_variant = "avss" if VARIANT == "avss_binary" else VARIANT
    train_step = jax.jit(make_train_step(fmodel, tx, cfg,
                                         variant=step_variant))

    corocl = TorchCoroCL(temperature=cfg.cl_temp, max_views=MAX_VIEWS)
    opt_v, opt_a = build_reference_optimizers(tmodel, cfg.lr, cfg.momentum,
                                              cfg.weight_decay)
    sched = WarmUpPolyLR(cfg.lr, cfg.lr_power, SPE * cfg.epochs,
                         SPE * cfg.warm_up_epoch)

    def snapshot():
        sdT = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        sdF = export_torch_state_dict(state.params, state.batch_stats)
        frozen_moved, rows = [], []
        for k, v0 in sd0_f32.items():
            if k.endswith("num_batches_tracked"):
                continue
            v0 = v0.astype(np.float64)
            dT = sdT[k] - v0
            dF = sdF[k].astype(np.float64) - v0
            nT = np.linalg.norm(dT.ravel())
            is_bn = "running_mean" in k or "running_var" in k
            if nT < 1e-15:
                if np.linalg.norm(dF.ravel()) > 1e-12:
                    frozen_moved.append(k)
                continue
            abs_err = float(np.linalg.norm((dF - dT).ravel()))
            mixed = abs_err / (nT + 1e-8)
            rows.append((float(mixed), abs_err, float(nT), k, is_bn))
        return sdT, dict(
            worst_params=sorted([r for r in rows if not r[4]],
                                reverse=True)[:5],
            worst_bn=sorted([r for r in rows if r[4]], reverse=True)[:3],
            frozen_moved=frozen_moved)

    t_losses, f_losses = [], []
    step1_report = None
    for step in range(STEPS):
        batch = build_batch(seed=step, in_plane=cfg.in_plane,
                            audio_samples=cfg.audio_samples)
        # stereo (audio_func=True): mel of the B unshuffled clips only;
        # otherwise the concatenated matched-then-shuffled 2B batch
        wave_in = batch["waveform"] if stereo else np.concatenate(
            [batch["waveform"], batch["waveform"][batch["shuffle_idx"]]], 0)
        mel32 = flax_mel(jnp.asarray(wave_in, np.float32),
                         n_frames=cfg.mel_frames, spec_min=cfg.spec_min,
                         spec_max=cfg.spec_max)
        mel64 = np.asarray(mel32, np.float64)
        tdrive = reference_train_step_stereo if stereo \
            else reference_train_step
        t_losses.append(tdrive(
            tmodel, corocl, opt_v, opt_a, sched, cur_iter=step,
            image=torch.from_numpy(batch["image"].astype(np.float64)
                                   ).permute(0, 3, 1, 2),
            **{"mel_b" if stereo else "mel_2b":
               torch.from_numpy(mel64).permute(0, 3, 1, 2).contiguous()},
            pix_label=torch.from_numpy(batch["pix_label"]).long(),
            img_label=torch.from_numpy(batch["img_label"]).long(),
            shuffle_idx=torch.from_numpy(batch["shuffle_idx"]).long()))

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb["image"] = jnp.asarray(batch["image"], jnp.float64)
        jb["mel"] = jnp.asarray(mel64)
        state, metrics = train_step(state, jb, jax.random.PRNGKey(100 + step),
                                    jnp.int32(0))
        f_losses.append((float(metrics["loss/loss"]),
                         float(metrics["loss/cross_entropy"]),
                         float(metrics["loss/l_ctr_av"])))
        if step == 0:
            step1_report = snapshot()[1]

    sdT, final_report = snapshot()

    moved_probes = {}
    probes = {
        "seg": "segment.aspp.red_conv.weight",
        "bkb": "backbone.backbone.layer1.0.conv1.weight",
        "fusion": "cross_att.blocks.0.attn.q.weight",
        "audio": ("audio_backbone.backbone.conv1.weight"
                  if cfg.audio_backbone == "18" else
                  "audio_backbone.backbone.features.0.weight"),
    }
    for g, k in probes.items():
        moved_probes[g] = float(np.abs(sdT[k]
                                       - sd0_f32[k].astype(np.float64)).max())

    print(json.dumps(dict(
        steps=STEPS, t_losses=t_losses, f_losses=f_losses,
        step1=step1_report, final=final_report,
        moved_probes=moved_probes)))


if __name__ == "__main__":
    main()
