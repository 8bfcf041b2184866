"""AOT model export: serialized StableHLO predict artifacts.

A deployment capability the reference has no analog of (its serving
story is "load the .pth in the research repo"): the full predict
program — on-device mel frontend + CAVP forward + argmax mask — is
exported with `jax.export` into one self-contained artifact (StableHLO
+ embedded weights) that a serving process can deserialize and execute
**without the model code, flax, or the checkpoint**, on any backend
that can lower it (TPU/CPU). Version-robust: the artifact pins its own
calling convention and shapes.

Format: a directory with
  predict.stablehlo   — serialized jax.export artifact (weights baked)
  meta.json           — shapes, setup, num_classes, framework versions

Cited reference gap: serving/deployment is absent upstream
(SURVEY.md §2.1 — entry points are research scripts only).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _predict_fn(model, config):
    """uint8 image + raw waveform -> (mask [B,H,W] int32, probs max)."""
    from cavp_tpu.engine.loops import preprocess_audio

    mean = jnp.asarray(config.image_mean, jnp.float32)
    std = jnp.asarray(config.image_std, jnp.float32)
    n_frames = config.mel_frames

    def predict(variables, image_u8, waveform):
        img = image_u8.astype(jnp.float32) / 255.0
        img = (img - mean) / std
        audio = preprocess_audio(waveform, n_frames=n_frames,
                                 spec_min=config.spec_min,
                                 spec_max=config.spec_max)
        logits, _, _ = model.apply(variables, img, audio, eval_mode=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        mask = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return mask, jnp.max(probs, axis=-1)

    return predict


def export_predict(model, variables, config, out_dir: str,
                   batch_size: int = 1,
                   image_hw: Optional[Tuple[int, int]] = None) -> str:
    """Export the predict program with weights embedded as constants.
    Returns the artifact directory."""
    H, W = image_hw or (config.image_height, config.image_width)
    predict = _predict_fn(model, config)

    # close over the weights so the artifact is self-contained
    fn = jax.jit(lambda img, wav: predict(variables, img, wav))
    img_s = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.uint8)
    wav_s = jax.ShapeDtypeStruct(
        (batch_size, config.in_plane, config.audio_samples), jnp.float32)
    # multi-platform lowering: export usually runs on a CPU host but the
    # artifact must execute on TPU serving hosts too — without this the
    # Exported pins platforms=(exporting backend,) and jax refuses to
    # run it anywhere else
    exported = jax_export.export(fn, platforms=("cpu", "tpu"))(img_s, wav_s)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "predict.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    meta: Dict[str, Any] = {
        "setup": config.setup,
        "num_classes": int(config.num_classes),
        "batch_size": batch_size,
        "image_hw": [int(H), int(W)],
        "waveform_shape": [batch_size, int(config.in_plane),
                           int(config.audio_samples)],
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedPredictor:
    """Loads an exported artifact and serves predictions — no model
    code, flax modules, or checkpoints required at load time.

    Exposes the :class:`cavp_tpu.engine.predictor.Predictor` serving
    surface (``predict`` / ``expected_shapes`` / ``warmup`` /
    ``batch_sizes``) so the HTTP daemon can serve straight from an
    artifact: ``scripts/serve.py --artifact <dir>``."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, "meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(artifact_dir, "predict.stablehlo"), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self._call = jax.jit(self._exported.call)
        self.batch_sizes = [int(self.meta["batch_size"])]

    def __call__(self, image_u8: np.ndarray, waveform: np.ndarray):
        mask, conf = self._call(jnp.asarray(image_u8, jnp.uint8),
                                jnp.asarray(waveform, jnp.float32))
        return np.asarray(mask), np.asarray(conf)

    # --- Predictor-compatible serving surface -------------------------
    def expected_shapes(self):
        h, w = self.meta["image_hw"]
        wav = self.meta["waveform_shape"]
        return ((h, w, 3), (wav[1], wav[2]))

    def warmup(self):
        img_s, wav_s = self.expected_shapes()
        b = self.batch_sizes[0]
        self.predict(np.zeros((b,) + img_s, np.uint8),
                     np.zeros((b,) + wav_s, np.float32))
        return self

    def predict(self, images: np.ndarray, waveforms: np.ndarray
                ) -> Dict[str, np.ndarray]:
        """Chunk/pad to the artifact's fixed batch (its shapes are baked
        into the program) via the shared serving loop."""
        from cavp_tpu.engine.predictor import run_chunked

        def forward_batch(img, wav):
            mask, conf = self(img, wav)
            return {"mask": mask, "conf": conf}

        img_s, wav_s = self.expected_shapes()
        return run_chunked(forward_batch, self.batch_sizes, img_s, wav_s,
                           images, waveforms)
