"""Fused log-mel frontend as a Pallas TPU kernel.

The north-star custom kernel (BASELINE.json): framing + Hann window +
real DFT + power + mel projection + dB + [-1,1] normalization in a
single VMEM-resident pass. The DFT is expressed as two MXU matmuls
against windowed cosine/sine bases (512-point rFFT of a 400-sample Hann
window), followed by the mel matmul — three chained matmuls whose
intermediates (power spectrum [rows, 257]) never round-trip to HBM,
which is the entire memory traffic of the unfused XLA path.

Numerics match :func:`cavp_tpu.audio.mel.preprocess_audio` (torchaudio
MelSpectrogram parity path, trainer_cavp_avss_image.py:44-57) to fp32
rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavp_tpu.audio.mel import _rdft_bases, melscale_fbanks, periodic_hann

N_FFT = 512
WIN = 400
HOP = 160
N_MELS = 64
N_FREQS = N_FFT // 2 + 1
FREQ_PAD = 384  # 257 padded to a lane-friendly width; pad cols are zero
ROW_TILE = 256

_LOG10 = 2.302585092994046


@functools.lru_cache(maxsize=None)
def _bases(f_min: float = 125.0, f_max: float = 3800.0):
    win = periodic_hann(WIN)
    full = np.zeros(N_FFT)
    lpad = (N_FFT - WIN) // 2
    full[lpad:lpad + WIN] = win
    cos_b, sin_b = _rdft_bases(N_FFT)
    wcos = np.zeros((N_FFT, FREQ_PAD), np.float32)
    wsin = np.zeros((N_FFT, FREQ_PAD), np.float32)
    wcos[:, :N_FREQS] = cos_b * full[:, None]
    wsin[:, :N_FREQS] = sin_b * full[:, None]
    fb = np.zeros((FREQ_PAD, N_MELS), np.float32)
    fb[:N_FREQS] = melscale_fbanks(N_FREQS, f_min, f_max, N_MELS, 16000)
    return wcos, wsin, fb


def _mel_kernel(frames_ref, wcos_ref, wsin_ref, fb_ref, out_ref, *,
                inv_half_range: float, mid: float):
    f = frames_ref[:]
    re = jnp.dot(f, wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wsin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    db = 20.0 * (jnp.log(jnp.maximum(mel, 1e-5)) / _LOG10)
    out_ref[:] = (db - mid) * inv_half_range


def fused_log_mel(wave: jnp.ndarray, n_frames: int,
                  spec_min: float = -100.0, spec_max: float = 100.0,
                  f_min: float = 125.0, f_max: float = 3800.0) -> jnp.ndarray:
    """[N, L] 16 kHz waveform -> [N, n_frames, 64] normalized log-mel."""
    N, L = wave.shape
    pad = N_FFT // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    # static-index framing gather: [N, n_frames, 512]
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = x[:, idx].reshape(N * n_frames, N_FFT).astype(jnp.float32)

    rows = N * n_frames
    padded_rows = ((rows + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    if padded_rows != rows:
        frames = jnp.pad(frames, ((0, padded_rows - rows), (0, 0)))

    wcos, wsin, fb = _bases(f_min, f_max)
    # normalization: 2*(db - spec_min)/(spec_max - spec_min) - 1
    half = (spec_max - spec_min) / 2.0
    mid = (spec_max + spec_min) / 2.0

    kernel = functools.partial(_mel_kernel, inv_half_range=1.0 / half, mid=mid)
    out = pl.pallas_call(
        kernel,
        grid=(padded_rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, N_FFT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, FREQ_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, FREQ_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_PAD, N_MELS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, N_MELS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_rows, N_MELS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_rows * N_FFT * FREQ_PAD * 2
            + 2 * padded_rows * FREQ_PAD * N_MELS,
            bytes_accessed=padded_rows * (N_FFT + N_MELS) * 4,
            transcendentals=padded_rows * N_MELS,
        ),
    )(frames, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(fb))
    return out[:rows].reshape(N, n_frames, N_MELS)
