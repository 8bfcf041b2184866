"""Full VGGish audio embedding model (wav -> log-mel -> 128-d),
including the PCA/quantization postprocessor.

Rebuilds ``torchvggish/vggish.py:9-205`` (the standalone VGGish that the
reference ships for offline feature extraction, and the alternate
``models/audio/audio_network_vggish.AudioModel``): the conv trunk is the
same :class:`~cavp_tpu.models.audio_nets.VGGAudio` stack; this module
adds the canonical 128-d embedding head and the AudioSet PCA-whitening +
8-bit quantization postprocessor, fed by the torchvggish-parity log-mel
frontend (:func:`cavp_tpu.audio.mel.waveform_to_examples`) — the
north-star "VGGish audio-only" configuration.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cavp_tpu.audio.mel import waveform_to_examples
from cavp_tpu.models.audio_nets import VGGAudio

EMBEDDING_SIZE = 128
QUANTIZE_MIN_VAL = -2.0
QUANTIZE_MAX_VAL = 2.0


class Postprocessor(nn.Module):
    """vggish.Postprocessor:34-106 — PCA whitening + 8-bit quantization."""

    @nn.compact
    def __call__(self, embeddings):
        eigen = self.param("pca_eigen_vectors", nn.initializers.zeros,
                           (EMBEDDING_SIZE, EMBEDDING_SIZE))
        means = self.param("pca_means", nn.initializers.zeros,
                           (EMBEDDING_SIZE, 1))
        pca = ((embeddings.T - means).T @ eigen.T)
        clipped = jnp.clip(pca, QUANTIZE_MIN_VAL, QUANTIZE_MAX_VAL)
        quantized = jnp.round(
            (clipped - QUANTIZE_MIN_VAL)
            * (255.0 / (QUANTIZE_MAX_VAL - QUANTIZE_MIN_VAL)))
        return jnp.squeeze(quantized)


class VGGish(nn.Module):
    """128-d VGGish with optional postprocessing."""

    postprocess: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk = VGGAudio(out_plane=EMBEDDING_SIZE, dtype=self.dtype)
        if self.postprocess:
            self.pproc = Postprocessor()

    def __call__(self, examples):
        """examples: [N, 96, 64, 1] log-mel patches -> [N, 128]."""
        emb = self.trunk(examples)
        if self.postprocess:
            emb = self.pproc(emb)
        return emb

    def forward_waveform(self, waveform):
        """Mono 16 kHz waveform -> [n_examples, 128]; the full
        ``vggish_input.waveform_to_examples`` + embed path."""
        examples = waveform_to_examples(waveform)  # [n, 1, 96, 64] NCHW
        examples = jnp.transpose(examples, (0, 2, 3, 1))
        return self(examples)
