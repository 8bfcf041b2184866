"""Diagnostic: per-leaf param-delta divergence after ONE train step.

Not a test — prints the worst leaves so train-parity failures can be
attributed to a group/leaf instead of guessed at.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
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
                             reference_train_step)
from train_parity_common import (B, IMG, NUM_CLASSES, MAX_VIEWS, SPE,
                                 build_batch, rel_err)

STEPS = int(os.environ.get("STEPS", "1"))

torch.manual_seed(0)
tmodel = TorchCAVP(num_classes=NUM_CLASSES)
randomize_bn_stats(tmodel, seed=1)
sd0 = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

cfg = get_config("avss").replace(
    num_classes=NUM_CLASSES, batch_size=B, lr=0.01, weight_decay=0.05,
    momentum=0.9, warm_up_epoch=1, epochs=2, max_view=MAX_VIEWS,
    image_width=IMG, image_height=IMG)

fmodel = CAVP(num_classes=NUM_CLASSES, cls_matched_only=False)
variables = fmodel.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32),
                        jnp.zeros((1, 96, 64, 1), jnp.float32), True)
params, batch_stats, report = import_torch_state_dict(
    sd0, variables["params"], variables["batch_stats"])
assert report["missing"] == []

tx, _ = make_optimizer(cfg, steps_per_epoch=SPE)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   sound_bank=init_bank(NUM_CLASSES, B, cfg.audio_samples))
train_step = jax.jit(make_train_step(fmodel, tx, cfg, variant="avss"))

corocl = TorchCoroCL(temperature=cfg.cl_temp, max_views=MAX_VIEWS)
opt_v, opt_a = build_reference_optimizers(tmodel, cfg.lr, cfg.momentum,
                                          cfg.weight_decay)
sched = WarmUpPolyLR(cfg.lr, cfg.lr_power, SPE * cfg.epochs,
                     SPE * cfg.warm_up_epoch)

for step in range(STEPS):
    batch = build_batch(seed=step)
    mel = flax_mel(jnp.asarray(np.concatenate(
        [batch["waveform"], batch["waveform"][batch["shuffle_idx"]]], 0)),
        n_frames=cfg.mel_frames, spec_min=cfg.spec_min, spec_max=cfg.spec_max)
    mel_t = torch.from_numpy(np.asarray(mel).copy()).permute(0, 3, 1, 2)
    tl = reference_train_step(
        tmodel, corocl, opt_v, opt_a, sched, cur_iter=step,
        image=torch.from_numpy(batch["image"]).permute(0, 3, 1, 2),
        mel_2b=mel_t.contiguous(),
        pix_label=torch.from_numpy(batch["pix_label"]).long(),
        img_label=torch.from_numpy(batch["img_label"]).long(),
        shuffle_idx=torch.from_numpy(batch["shuffle_idx"]).long())
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = train_step(state, jb, jax.random.PRNGKey(100 + step),
                                jnp.int32(0))
    fl = (float(metrics["loss/loss"]), float(metrics["loss/cross_entropy"]),
          float(metrics["loss/l_ctr_av"]))
    print(f"step {step}: torch {tl}")
    print(f"step {step}: flax  {fl}")

sdT = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
sdF = export_torch_state_dict(state.params, state.batch_stats)

rows = []
for k, v0 in sd0.items():
    if k.endswith("num_batches_tracked"):
        continue
    dT = sdT[k].astype(np.float64) - v0.astype(np.float64)
    dF = sdF[k].astype(np.float64) - v0.astype(np.float64)
    nT = np.linalg.norm(dT.ravel())
    nF = np.linalg.norm(dF.ravel())
    e = rel_err(dF, dT) if nT > 1e-12 else (np.inf if nF > 1e-9 else 0.0)
    rows.append((e, k, nT, nF))

rows.sort(reverse=True)
print(f"\nworst leaves after {STEPS} step(s):")
for e, k, nT, nF in rows[:25]:
    print(f"  relerr={e:9.4g}  |dT|={nT:10.4g}  |dF|={nF:10.4g}  {k}")
