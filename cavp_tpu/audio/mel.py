"""Log-mel frontends, TPU-native.

Two parameterizations exist in the reference and both are rebuilt here:

1. **Trainer mel** (`trainer_cavp_avss_image.py:44-57,66-76`): torchaudio
   ``MelSpectrogram(16000, n_fft=512, win=400, hop=160, 64 mels,
   125-3800 Hz)`` -> power spectrum -> HTK mel (norm=None) -> truncate to
   96/300 frames -> transpose -> dB(20*log10 max 1e-5) -> [-1,1] by
   spec_min/max=±100. Used on-device inside every train/eval step.

2. **VGGish mel** (`torchvggish/mel_features.py`, ``vggish_input.py:30-81``):
   25 ms / 10 ms frames, periodic Hann, |rfft_512|, HTK mel 125-7500 Hz
   with the mel-domain triangle construction and a zeroed DC bin,
   log(mel + 0.01), framed into [N, 1, 96, 64] examples. This is the
   parameterization the released VGGish weights were trained on.

Design notes (TPU): framing is expressed as a gather with a static index
matrix and the DFT as two real matmuls (cos/sin bases) so the whole
frontend is MXU work that XLA fuses with the downstream mel matmul; a
fused single-pass Pallas kernel lives in
:mod:`cavp_tpu.ops.pallas.mel_kernel` and is used via ``use_pallas=True``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cavp_tpu.audio.functional import db_from_amp, normalize_spec

SAMPLE_RATE = 16000

# ---------------------------------------------------------------------------
# Window / basis / filterbank construction (host-side numpy, cached)
# ---------------------------------------------------------------------------


def periodic_hann(window_length: int) -> np.ndarray:
    """Periodic Hann window (one full cosine cycle), as used by both
    torchaudio (``torch.hann_window`` default) and torchvggish."""
    return 0.5 - 0.5 * np.cos(
        2.0 * np.pi / window_length * np.arange(window_length)
    )


@functools.lru_cache(maxsize=None)
def _rdft_bases(n_fft: int) -> tuple:
    """Real-DFT cosine/sine bases of shape [n_fft, n_fft//2+1]."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang), -np.sin(ang)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], torchaudio semantics
    (mel_scale="htk", norm=None): triangles linear in the *Hz* domain
    between mel-spaced edge frequencies."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float64)


@functools.lru_cache(maxsize=None)
def vggish_mel_matrix(
    n_freqs: int = 257,
    f_min: float = 125.0,
    f_max: float = 7500.0,
    n_mels: int = 64,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Mel matrix [n_freqs, n_mels] with torchvggish semantics
    (``mel_features.spectrogram_to_mel_matrix:114-189``): HTK mel scale
    1127*ln(1+f/700), triangles linear in the *mel* domain, DC bin zeroed."""
    def hz_to_mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    bins_hz = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    bins_mel = hz_to_mel(bins_hz)
    edges = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    lower_slope = (bins_mel[:, None] - lower[None, :]) / (center - lower)[None, :]
    upper_slope = (upper[None, :] - bins_mel[:, None]) / (upper - center)[None, :]
    fb = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    fb[0, :] = 0.0
    return fb


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[..., L] -> [..., T, frame_length]; T = 1 + floor((L-len)/hop).

    Matches ``mel_features.frame:21-45`` (no padding, tail dropped).
    Implemented as a static-index gather so XLA lowers it to a cheap
    dynamic-slice-free reshape-friendly op.
    """
    length = x.shape[-1]
    num_frames = 1 + (length - frame_length) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


# ---------------------------------------------------------------------------
# Trainer mel (torchaudio MelSpectrogram parity)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "win_length", "hop_length", "n_mels", "f_min", "f_max",
        "power", "compute_dtype",
    ),
)
def mel_spectrogram(
    wave: jnp.ndarray,
    *,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 64,
    f_min: float = 125.0,
    f_max: float = 3800.0,
    power: float = 2.0,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """torchaudio-parity mel spectrogram: [..., L] -> [..., n_mels, T].

    center=True reflect padding, Hann(win_length) zero-padded to n_fft
    symmetrically, power spectrum, HTK mel (norm=None) — the trainer STFT
    at ``trainer_cavp_avss_image.py:44-54``.
    """
    pad = n_fft // 2
    x = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)  # [..., T, n_fft]

    win = periodic_hann(win_length)
    lpad = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft)
    win_full[lpad:lpad + win_length] = win

    cos_b, sin_b = _rdft_bases(n_fft)
    wcos = jnp.asarray(cos_b * win_full[:, None], compute_dtype)
    wsin = jnp.asarray(sin_b * win_full[:, None], compute_dtype)
    frames = frames.astype(compute_dtype)
    re = frames @ wcos
    im = frames @ wsin
    spec = re * re + im * im  # power=2.0
    if power != 2.0:
        spec = jnp.power(jnp.sqrt(spec), power)
    fb = jnp.asarray(
        melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, SAMPLE_RATE),
        compute_dtype,
    )
    mel = spec @ fb  # [..., T, n_mels]
    return jnp.swapaxes(mel, -1, -2)


def preprocess_audio(
    wave: jnp.ndarray,
    *,
    n_frames: int,
    spec_min: float = -100.0,
    spec_max: float = 100.0,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """The trainer's on-device audio pipeline: [N, C, L] -> [N, C, T, 64].

    Mirrors ``CAVP_TRAINER.preprocess_audio`` (`trainer_cavp_avss_image.py:66-76`):
    mel -> truncate to n_frames -> transpose -> dB -> normalize to [-1,1].
    """
    N, C, L = wave.shape
    flat = wave.reshape(N * C, L)
    if use_pallas:
        from cavp_tpu.ops.pallas.mel_kernel import fused_log_mel
        out = fused_log_mel(flat, n_frames=n_frames,
                            spec_min=spec_min, spec_max=spec_max)
        return out.reshape(N, C, n_frames, out.shape[-1])
    mel = mel_spectrogram(flat)[:, :, :n_frames]  # [NC, 64, T]
    mel = jnp.swapaxes(mel, -1, -2)  # [NC, T, 64]
    mel = db_from_amp(mel)
    mel = normalize_spec(mel, spec_min, spec_max)
    return mel.reshape(N, C, n_frames, mel.shape[-1])


# ---------------------------------------------------------------------------
# VGGish frontend (torchvggish parity)
# ---------------------------------------------------------------------------

VGGISH_PARAMS = dict(
    sample_rate=SAMPLE_RATE,
    stft_window_length_seconds=0.025,
    stft_hop_length_seconds=0.010,
    num_mel_bins=64,
    mel_min_hz=125.0,
    mel_max_hz=7500.0,
    log_offset=0.01,
    example_window_seconds=0.96,
    example_hop_seconds=0.96,
)


@functools.partial(jax.jit, static_argnames=("sample_rate",))
def vggish_log_mel(data: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """[..., L] (mono, 16 kHz) -> [..., T, 64] log-mel, torchvggish parity
    (``mel_features.log_mel_spectrogram:192-223``)."""
    p = VGGISH_PARAMS
    win_len = int(round(sample_rate * p["stft_window_length_seconds"]))  # 400
    hop = int(round(sample_rate * p["stft_hop_length_seconds"]))  # 160
    fft_length = 2 ** int(math.ceil(math.log(win_len, 2)))  # 512

    frames = frame_signal(data, win_len, hop)  # [..., T, 400]
    win = jnp.asarray(periodic_hann(win_len), jnp.float32)
    windowed = frames * win
    # rfft(x, 512) zero-pads the 400-sample windowed frame at the end;
    # expressed as matmul against the first 400 rows of the DFT bases.
    cos_b, sin_b = _rdft_bases(fft_length)
    re = windowed @ jnp.asarray(cos_b[:win_len], jnp.float32)
    im = windowed @ jnp.asarray(sin_b[:win_len], jnp.float32)
    mag = jnp.sqrt(re * re + im * im)  # magnitude, not power
    fb = jnp.asarray(
        vggish_mel_matrix(fft_length // 2 + 1, p["mel_min_hz"], p["mel_max_hz"],
                          p["num_mel_bins"], sample_rate),
        jnp.float32,
    )
    mel = mag @ fb
    return jnp.log(mel + p["log_offset"])


def waveform_to_examples(data: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """Waveform -> VGGish input examples [n, 1, 96, 64]
    (``vggish_input.waveform_to_examples:30-81``; resampling to 16 kHz
    happens host-side in the data pipeline).

    ``data``: [num_samples] mono, or [num_samples, num_channels] in the
    reference's soundfile layout — mono-ized over axis 1 exactly as
    ``vggish_input.py:48-49`` does (NOT the repo's torchaudio-style
    [channels, samples]; transpose first if coming from audio_io)."""
    if data.ndim > 1:
        data = jnp.mean(data, axis=1)
    assert sample_rate == SAMPLE_RATE, "resample on host before calling"
    log_mel = vggish_log_mel(data)  # [T, 64]
    window = int(round(
        VGGISH_PARAMS["example_window_seconds"]
        / VGGISH_PARAMS["stft_hop_length_seconds"]))  # 96
    hop = int(round(
        VGGISH_PARAMS["example_hop_seconds"]
        / VGGISH_PARAMS["stft_hop_length_seconds"]))  # 96
    t = log_mel.shape[0]
    n = 1 + (t - window) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(window)[None, :]
    return log_mel[idx][:, None, :, :]
