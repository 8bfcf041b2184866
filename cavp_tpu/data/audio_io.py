"""Host-side audio IO.

Rebuilds the loader-side audio path
(``dataset/avss/audio/audio_dataset.py:31-65``): wav decode, resample to
16 kHz, center-crop/tile to ``audio_len`` seconds, mono mean — without
torchaudio (stdlib ``wave`` + scipy polyphase resampling). The VPO
synthesis ops (amplitude panning, multi-source mixture) rebuild
``dataset/vpo_stereo/*/audio/audio_dataset.py:51-71``.
"""

from __future__ import annotations

import wave as wave_mod
from typing import Tuple

import numpy as np
from scipy.signal import resample_poly

TARGET_SR = 16000


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (waveform [channels, samples] float32 in [-1,1], sr)."""
    with wave_mod.open(path, "rb") as f:
        sr = f.getframerate()
        n_channels = f.getnchannels()
        sampwidth = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    data = data.reshape(-1, n_channels).T
    return data, sr


def resample(wave: np.ndarray, sr: int, target_sr: int = TARGET_SR) -> np.ndarray:
    if sr == target_sr:
        return wave
    from math import gcd

    g = gcd(sr, target_sr)
    return resample_poly(wave, target_sr // g, sr // g, axis=-1).astype(
        np.float32)


def crop_audio(wave: np.ndarray, audio_len: float, sr: int = TARGET_SR
               ) -> np.ndarray:
    """Center-crop to audio_len seconds, tiling when short
    (audio_dataset.crop_audio:51-62).

    Bit-faithful to the reference's python slicing: when the clip is
    shorter than audio_len, ``st`` goes negative and ``wave[:, st:et]``
    wraps from the END — the reference keeps only the LAST ``-st``
    samples and tiles those, not the whole waveform.
    """
    mid = wave.shape[-1] // 2
    sample_len = int(audio_len * sr)
    st = mid - sample_len // 2
    et = st + sample_len
    out = wave[..., st:et]  # negative st wraps, exactly like the reference
    if out.shape[-1] != sample_len:
        reps = sample_len // max(out.shape[-1], 1) + 1
        out = np.tile(out, (1,) * (out.ndim - 1) + (reps,))[..., :sample_len]
    return out


def load_audio(path: str, audio_len: float, mono: bool = True) -> np.ndarray:
    """Full loader path: [1, L] (mono mean) or [C, L]."""
    wave, sr = load_wav(path)
    wave = resample(wave, sr)
    wave = crop_audio(wave, audio_len)
    if mono:
        wave = np.mean(wave, axis=0, keepdims=True)
    return wave.astype(np.float32)


def pan_stereo(wave: np.ndarray, position: float, weight: float = 1.0
               ) -> np.ndarray:
    """Amplitude panning L=w(1-pos), R=w*pos
    (dataset/vpo_stereo/single_source/audio/audio_dataset.py:57-68)."""
    mono = wave.mean(axis=0) if wave.ndim == 2 else wave
    left = weight * (1.0 - position) * mono
    right = weight * position * mono
    return np.stack([left, right]).astype(np.float32)


def mix_sources(waves) -> np.ndarray:
    """Sum several (panned/cropped) waveforms into one mixture
    (dataset/vpo_stereo/multi_source/audio/audio_dataset.py:51-71)."""
    out = np.zeros_like(waves[0])
    for w in waves:
        out = out + w
    return out.astype(np.float32)
