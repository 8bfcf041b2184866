"""Shared fixture builders for the end-to-end train-step parity harness
(tests/test_train_parity.py + tests/_train_parity_fp64.py).

Determinism strategy (host randomness can't be bit-matched across
frameworks):

- the shuffle permutation is injected into both sides
  (``batch["shuffle_idx"]``);
- steps run at epoch 0, where the reference gates off the
  overwrite-miss-match path (``if epoch >= 1``,
  trainer_cavp_avss_image.py:188) — the only remaining RNG consumer is
  CoroCL sampling;
- CoroCL sampling is *exhaustive by construction*: exactly one
  foreground class with exactly ``max_views`` pixels at feature
  resolution and exactly ``max_views`` background pixels, so
  ``sample_num = min(max_views, n_fg, n_bg) = max_views`` and every
  random subset IS the full set on both sides
  (loss/contrastive_aud.py:110-142). InfoNCE is permutation-invariant
  over anchors, so draw order doesn't matter.
"""

import numpy as np

B = 4
IMG = 64            # feature res = IMG/4 = 16 (stride-4 low-level concat)
FEAT = IMG // 4
NUM_CLASSES = 8
MAX_VIEWS = 300     # == total fg px == total bg px at feature res
SPE = 4             # steps per epoch (LR schedule denominator)

# High weight decay so a missing/extra decay term is visible above any
# numerical tolerance within 3 steps.
HYPERS = dict(lr=0.01, weight_decay=0.05, momentum=0.9, warm_up_epoch=1,
              epochs=2)


def build_labels():
    """Per-sample feature-res label grids with exact global counts:
    class-1 fg = MAX_VIEWS, bg = MAX_VIEWS, rest ignore=255. Upsampled
    x4 as constant blocks so nearest-downsample recovers them exactly."""
    fg_counts = [100, 100, 50, 50]
    bg_counts = [75, 75, 75, 75]
    assert sum(fg_counts) == MAX_VIEWS and sum(bg_counts) == MAX_VIEWS
    grids = []
    rng = np.random.RandomState(0)
    for f, b in zip(fg_counts, bg_counts):
        flat = np.full(FEAT * FEAT, 255, np.int32)
        pos = rng.permutation(FEAT * FEAT)
        flat[pos[:f]] = 1
        flat[pos[f:f + b]] = 0
        grids.append(flat.reshape(FEAT, FEAT))
    label16 = np.stack(grids)                      # [B,16,16]
    label64 = np.kron(label16, np.ones((1, 4, 4), np.int32))
    return label64.astype(np.int32)                # [B,64,64]


def build_batch(seed=0, in_plane=1, audio_samples=16000):
    rng = np.random.RandomState(seed)
    image = rng.randn(B, IMG, IMG, 3).astype(np.float32)
    wave = (rng.randn(B, in_plane, audio_samples) * 0.1).astype(np.float32)
    pix = build_labels()
    # multi-hot img labels: samples 0/1 match ({bg, 1}); 2/3 differ by a
    # phantom extra class (no pixels — keeps sampling exhaustive) so the
    # injected permutation [1,0,3,2] yields both match branches
    img_label = np.zeros((B, NUM_CLASSES), np.int32)
    img_label[:, 0] = 1
    img_label[:, 1] = 1
    img_label[2, 2] = 1
    img_label[3, 3] = 1
    shuffle_idx = np.array([1, 0, 3, 2], np.int32)
    return dict(image=image, waveform=wave, pix_label=pix,
                img_label=img_label, shuffle_idx=shuffle_idx)


def rel_err(a, b):
    denom = np.linalg.norm(np.asarray(b, np.float64).ravel())
    return np.linalg.norm((np.asarray(a, np.float64)
                           - np.asarray(b, np.float64)).ravel()) / (denom + 1e-12)


def make_test_config(get_config, variant="avss"):
    cfg = get_config("avss").replace(
        num_classes=NUM_CLASSES, batch_size=B, max_view=MAX_VIEWS,
        image_width=IMG, image_height=IMG, **HYPERS)
    if variant == "vpo_stereo":
        # the stereo configuration: 3 s audio -> ResNet-18 audio tower,
        # 2-channel waveforms (config_vpo_ss.py:51, in_plane=2)
        cfg = cfg.replace(audio_len=3.0, audio_backbone="18", in_plane=2)
    elif variant == "avss_binary":
        # binary S4/MS3 setting (trainer_cavp_avs_obj.py train loop at
        # epoch 0 with avsbench_split != "all"): identical hot-loop math
        # to avss, but the setup gates turn the sound bank and the
        # overwrite plumbing OFF in the jitted step (engine/loops.py
        # use_wave_bank/use_overwrite). The leg measures that flipping
        # those gates does not perturb the step (VERDICT r3 #5's "if
        # cheap" half). Fixture classes stay at NUM_CLASSES — the gate
        # logic, not the head width, is what differs under test.
        cfg = cfg.replace(setup="avss_binary", avsbench_split="s4")
    elif variant == "vpo_mono":
        # vpo_mono (trainer_cavp_vpo_mono.py:30-308): mono 3-s clips,
        # ResNet-18 audio tower, audio_func=False (2B waveform concat
        # like avss); bank/overwrite live but epoch>=1-gated, so inert
        # at this epoch-0 drive — the leg pins the tower + mel-frame
        # (n_len=300, trainer_cavp_vpo_mono.py:63) composition.
        cfg = cfg.replace(audio_len=3.0, audio_backbone="18", in_plane=1)
    return cfg
