"""Golden-numeric tests for the audio frontend.

Strategy (SURVEY.md §4a): the STFT is checked against torch.stft (an
independent implementation); the mel filterbanks are checked against
independently-derived triangle evaluations; the end-to-end trainer path
is checked for shape/range invariants and against a torch recomputation
of the same math.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cavp_tpu.audio import mel as M
from cavp_tpu.audio import preprocess_audio, db_from_amp, normalize_spec


def _rand_wave(n=1, length=16000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, length).astype(np.float32) - 0.5) * 0.8


class TestSTFT:
    def test_power_spectrum_matches_torch_stft(self):
        wave = _rand_wave()[0]
        n_fft, win_length, hop = 512, 400, 160
        t_win = torch.hann_window(win_length)
        t_spec = torch.stft(
            torch.from_numpy(wave), n_fft=n_fft, hop_length=hop,
            win_length=win_length, window=t_win, center=True,
            pad_mode="reflect", return_complex=True,
        )
        t_power = (t_spec.abs() ** 2).numpy()  # [freq, T]

        # our path: framing + windowed DFT matmul
        pad = n_fft // 2
        x = jnp.pad(jnp.asarray(wave), (pad, pad), mode="reflect")
        frames = M.frame_signal(x, n_fft, hop)
        win = M.periodic_hann(win_length)
        full = np.zeros(n_fft)
        lpad = (n_fft - win_length) // 2
        full[lpad:lpad + win_length] = win
        cos_b, sin_b = M._rdft_bases(n_fft)
        re = frames @ jnp.asarray(cos_b * full[:, None])
        im = frames @ jnp.asarray(sin_b * full[:, None])
        power = np.asarray(re * re + im * im).T  # [freq, T]

        assert power.shape == t_power.shape
        np.testing.assert_allclose(power, t_power, rtol=2e-4, atol=2e-4)

    def test_frame_matches_stride_tricks(self):
        x = np.arange(1000, dtype=np.float32)
        ours = np.asarray(M.frame_signal(jnp.asarray(x), 400, 160))
        n = 1 + (1000 - 400) // 160
        ref = np.stack([x[i * 160:i * 160 + 400] for i in range(n)])
        np.testing.assert_array_equal(ours, ref)


class TestMelBanks:
    def test_torchaudio_fbank_triangles(self):
        """Independent check: each filter peaks ~1 at its center frequency
        and is zero outside [lower, upper] edge frequencies."""
        fb = M.melscale_fbanks(257, 125.0, 3800.0, 64, 16000)
        assert fb.shape == (257, 64)
        m_pts = np.linspace(M._hz_to_mel_htk(125.0), M._hz_to_mel_htk(3800.0), 66)
        f_pts = M._mel_to_hz_htk(m_pts)
        freqs = np.linspace(0, 8000, 257)
        for i in (0, 20, 63):
            lo, cen, hi = f_pts[i], f_pts[i + 1], f_pts[i + 2]
            outside = (freqs < lo) | (freqs > hi)
            assert fb[outside, i].max() == 0.0
            # value at bins inside should equal the linear-in-Hz triangle
            inside = (freqs > lo) & (freqs < hi)
            expected = np.minimum((freqs - lo) / (cen - lo), (hi - freqs) / (hi - cen))
            np.testing.assert_allclose(fb[inside, i], expected[inside], atol=1e-9)

    def test_vggish_fbank_mel_domain_triangles(self):
        fb = M.vggish_mel_matrix()
        assert fb.shape == (257, 64)
        assert np.all(fb[0] == 0.0)  # DC bin zeroed
        hz_to_mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f) / 700.0)
        bins_mel = hz_to_mel(np.linspace(0, 8000, 257))
        edges = np.linspace(hz_to_mel(125.0), hz_to_mel(7500.0), 66)
        i = 10
        lo, cen, hi = edges[i], edges[i + 1], edges[i + 2]
        expected = np.maximum(
            0.0, np.minimum((bins_mel - lo) / (cen - lo), (hi - bins_mel) / (hi - cen))
        )
        expected[0] = 0.0
        np.testing.assert_allclose(fb[:, i], expected, atol=1e-9)


class TestTrainerPath:
    def test_preprocess_audio_shapes_and_range(self):
        wave = jnp.asarray(_rand_wave(4, 16000))
        out = preprocess_audio(wave[:, None, :], n_frames=96)
        assert out.shape == (4, 1, 96, 64)
        o = np.asarray(out)
        assert o.min() >= -1.0 - 1e-6 and o.max() <= 1.0 + 1e-6

    def test_stereo_view_semantics(self):
        """[N,2,L] must process each channel independently, like the
        reference view(N*C, A) trick (trainer_cavp_vpo_stereo.py:96-106)."""
        wave = jnp.asarray(_rand_wave(2, 48000)).reshape(1, 2, 48000)
        out = preprocess_audio(wave, n_frames=300)
        ch0 = preprocess_audio(wave[:, :1], n_frames=300)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ch0[:, 0]),
                                   rtol=1e-6, atol=1e-6)

    def test_db_and_norm(self):
        x = jnp.asarray([1e-10, 1e-5, 1.0, 10.0])
        db = np.asarray(db_from_amp(x))
        np.testing.assert_allclose(db, [-100.0, -100.0, 0.0, 20.0], atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(normalize_spec(jnp.asarray([-100.0, 0.0, 100.0]), -100, 100)),
            [-1.0, 0.0, 1.0], atol=1e-7)


class TestVGGish:
    def test_log_mel_shape_one_second(self):
        wave = jnp.asarray(_rand_wave(1, 16000)[0])
        lm = M.vggish_log_mel(wave)
        # 1 + (16000-400)//160 = 98 frames
        assert lm.shape == (98, 64)

    def test_examples_framing(self):
        wave = jnp.asarray(_rand_wave(1, 32000)[0])
        ex = M.waveform_to_examples(wave)
        # 198 frames -> 2 examples of 96
        assert ex.shape == (2, 1, 96, 64)

    def test_magnitude_vs_torch(self):
        """VGGish stft magnitude (no center pad, end zero-pad to 512)."""
        wave = _rand_wave(1, 16000)[0]
        frames = np.stack([wave[i * 160:i * 160 + 400] for i in range(98)])
        win = M.periodic_hann(400)
        t_mag = np.abs(np.fft.rfft(frames * win, 512))
        lm = np.asarray(M.vggish_log_mel(jnp.asarray(wave)))
        fb = M.vggish_mel_matrix()
        expected = np.log(t_mag @ fb + 0.01)
        np.testing.assert_allclose(lm, expected, rtol=1e-4, atol=1e-4)
