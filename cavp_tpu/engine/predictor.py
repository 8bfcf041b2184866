"""Serving-oriented inference API.

A thin production wrapper around the jitted CAVP forward: fixed compiled
shapes (one compile per bucket), automatic batch padding, numpy in/out,
optional on-device mel from raw waveforms. This is the deployment
surface the reference lacks entirely (its eval scripts are research
loops); shapes are locked up front so serving never triggers a
recompile.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from cavp_tpu.config.setups import Config
from cavp_tpu.engine.checkpoint import load_model_variables
from cavp_tpu.engine.loops import preprocess_audio


def run_chunked(forward_batch, batch_sizes, img_shape, wav_shape,
                images: np.ndarray, waveforms: np.ndarray
                ) -> Dict[str, np.ndarray]:
    """Shared padding-safe serving loop (Predictor + ExportedPredictor):
    validates the compiled shapes, pads each chunk up to a compiled
    bucket, slices the padding back off, reassembles per-key.

    ``forward_batch(img, wav) -> {name: np.ndarray [bucket, ...]}`` for
    exactly-bucket-sized inputs. Off-config shapes are rejected — each
    stray shape would otherwise trigger a fresh jit compile (minutes on
    a remote TPU), breaking the fixed-compiled-shapes serving contract.
    """
    if images.shape[0] == 0:
        raise ValueError("empty batch")
    if tuple(images.shape[1:]) != tuple(img_shape):
        raise ValueError(f"image shape {tuple(images.shape[1:])} != "
                         f"compiled {tuple(img_shape)}")
    if tuple(waveforms.shape[1:]) != tuple(wav_shape):
        raise ValueError(f"waveform shape {tuple(waveforms.shape[1:])} != "
                         f"compiled {tuple(wav_shape)}")
    buckets = sorted(batch_sizes)
    n = images.shape[0]
    outs: Dict[str, list] = {}
    start = 0
    while start < n:
        chunk = min(n - start, buckets[-1])
        bucket = next((b for b in buckets if chunk <= b), buckets[-1])
        img = np.zeros((bucket,) + images.shape[1:], images.dtype)
        wav = np.zeros((bucket,) + waveforms.shape[1:], waveforms.dtype)
        img[:chunk] = images[start:start + chunk]
        wav[:chunk] = waveforms[start:start + chunk]
        for k, v in forward_batch(img, wav).items():
            outs.setdefault(k, []).append(np.asarray(v)[:chunk])
        start += chunk
    return {k: np.concatenate(v) for k, v in outs.items()}


class Predictor:
    """Batched sounding-object segmentation inference.

    Example:
        p = Predictor(config, ckpt_path="avss_224.pth", batch_sizes=(8,))
        masks = p.predict(images_uint8, waveforms)   # [N, H, W] int32
    """

    def __init__(self, config: Config, ckpt_path: str = "",
                 batch_sizes: Sequence[int] = (8,),
                 return_probs: bool = False):
        from cavp_tpu.engine.runner import build_model

        self.config = config
        self.batch_sizes = sorted(batch_sizes)
        self.return_probs = return_probs
        self.model = build_model(config)

        rng = jax.random.PRNGKey(config.seed)
        image = jnp.zeros((1, config.image_height, config.image_width, 3))
        audio = jnp.zeros((1, config.mel_frames, 64, config.in_plane))
        if ckpt_path:
            # a checkpoint supplies every parameter: build zero templates
            # via eval_shape instead of model.init — real init is hundreds
            # of small compiles (minutes of serving startup on TPU)
            shapes = jax.eval_shape(
                lambda r: self.model.init(r, image, audio, eval_mode=True),
                rng)
            variables = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes)
        else:
            variables = self.model.init(rng, image, audio, eval_mode=True)
        params, batch_stats = variables["params"], variables["batch_stats"]
        if ckpt_path:
            params, batch_stats, report = load_model_variables(
                ckpt_path, params, batch_stats, seg_model=config.seg_model)
            if report["unexpected"] or report["missing"]:
                raise ValueError(
                    f"checkpoint mismatch: {len(report['unexpected'])} "
                    f"unexpected / {len(report['missing'])} missing keys")
        self.variables = {"params": jax.device_put(params),
                          "batch_stats": jax.device_put(batch_stats)}

        mean = np.asarray(config.image_mean, np.float32)
        std = np.asarray(config.image_std, np.float32)

        from cavp_tpu.engine.loops import make_inference_forward
        infer = make_inference_forward(self.model, config)

        def _forward(variables, image, waveform):
            img = (image.astype(jnp.float32) / 255.0 - mean) / std
            audio = preprocess_audio(waveform,
                                     n_frames=config.mel_frames,
                                     spec_min=config.spec_min,
                                     spec_max=config.spec_max)
            logits = infer(variables, img, audio)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if return_probs:
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return pred, probs
            return pred, None

        self._forward = jax.jit(_forward)
        self._warmup_lock = threading.Lock()
        self._warmed = False

    def warmup(self):
        """Compile every batch bucket ahead of serving — through the full
        ``predict`` path (not just the jitted forward): on remote-TPU
        transports the first end-to-end round can cost tens of seconds
        beyond the compile, and serving should never see a cold path.

        Idempotent and thread-safe: concurrent callers (e.g. a health
        checker racing the serve loop) serialize on a lock and every
        bucket compiles exactly once."""
        with self._warmup_lock:
            if self._warmed:
                return self
            for b in self.batch_sizes:
                img = np.zeros((b, self.config.image_height,
                                self.config.image_width, 3), np.uint8)
                wav = np.zeros((b, self.config.in_plane,
                                self.config.audio_samples), np.float32)
                self.predict(img, wav)
            self._warmed = True
        return self

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def expected_shapes(self) -> Tuple[Tuple[int, int, int],
                                       Tuple[int, int]]:
        """((H, W, 3), (Cin, L)) this predictor's compiles accept."""
        return ((self.config.image_height, self.config.image_width, 3),
                (self.config.in_plane, self.config.audio_samples))

    def predict(self, images: np.ndarray, waveforms: np.ndarray
                ) -> Dict[str, np.ndarray]:
        """images: [N, H, W, 3] uint8; waveforms: [N, Cin, L] float32
        (16 kHz). Returns {"mask": [N, H, W] int32, "probs": optional}.
        Requests larger than the biggest bucket are chunked
        (:func:`run_chunked`)."""

        def forward_batch(img, wav):
            pred, pr = self._forward(self.variables, jnp.asarray(img),
                                     jnp.asarray(wav))
            out = {"mask": pred}
            if pr is not None:
                out["probs"] = pr
            return out

        img_shape, wav_shape = self.expected_shapes()
        return run_chunked(forward_batch, self.batch_sizes, img_shape,
                           wav_shape, images, waveforms)
