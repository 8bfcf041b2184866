"""Spatially-sharded (sequence/token-parallel) high-resolution inference.

SURVEY.md §5.7: the reference has no sequence parallelism and none is
needed at 224–512² — but the one long axis in CAVP is the visual token
grid entering the fusion (128×128 = 16k tokens at 1024² input), and the
TPU-native way to scale past single-chip memory/latency at high
resolution is to shard the *pixel/token* axis of the whole eval step
over the mesh. This module does exactly that:

- the image's H axis is sharded across the ``data`` axis of the mesh;
- XLA's SPMD partitioner emits conv halo exchanges for every
  convolution automatically (this is the "let the compiler insert
  collectives" recipe — no hand-written ring code);
- the sigmoid cross-attention is *per-token* against a single audio
  token (models/attn.py: attention [N,1] with one key), so the fusion
  stage shards with **zero** collectives;
- eval-mode BatchNorm uses running averages — no cross-shard
  statistics exist;
- per-pixel outputs (logits/masks) come back sharded the same way, and
  metric reductions sum across shards inside jit.

Numerically identical to the single-device forward (pinned by
tests/test_spatial_sharding.py on the 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cavp_tpu.parallel.mesh import DATA_AXIS


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image sharded along H over the mesh's data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None, None))


def make_spatial_infer(model, mesh: Mesh, variables: Optional[Any] = None):
    """Returns infer -> logits with the image (and logits) H-sharded
    over ``mesh``. ``image`` [B, H, W, 3] NHWC — H must be divisible by
    the mesh size at the model's output stride granularity (use
    multiples of 32·n_devices to be safe across the deep-stem/os8
    paths).

    Pass ``variables`` at build time to replicate them over the mesh
    ONCE — the returned ``run(image, audio)`` then only places the
    per-call inputs (re-placing the full ~60M-param tree every call
    would be a per-leaf transfer storm, minutes over a tunneled chip).
    Without it, the legacy ``run(variables, image, audio)`` signature is
    returned and the caller owns variable placement."""
    img_shard = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    @jax.jit
    def infer(variables, image, audio):
        logits, _, _ = model.apply(variables, image, audio, eval_mode=True)
        return logits

    if variables is not None:
        placed = jax.tree.map(lambda a: jax.device_put(a, rep), variables)

        def run(image, audio):
            image = jax.device_put(image, img_shard)
            audio = jax.device_put(audio, rep)
            return infer(placed, image, audio)

        return run

    def run_with_vars(variables, image, audio):
        image = jax.device_put(image, img_shard)
        audio = jax.device_put(audio, rep)
        variables = jax.tree.map(lambda a: jax.device_put(a, rep), variables)
        return infer(variables, image, audio)

    return run_with_vars


def make_spatial_eval_step(model, config, mesh: Mesh):
    """Spatially-sharded variant of the batched eval step: metrics are
    identical (device-carried, summed across shards by XLA)."""
    from cavp_tpu.engine.loops import make_eval_step

    step = make_eval_step(model, config)
    img_shard = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    jitted = jax.jit(step)

    def run(variables, metrics, batch):
        batch = dict(batch)
        batch["image"] = jax.device_put(batch["image"], img_shard)
        # per-pixel labels ride the same spatial sharding
        batch["pix_label"] = jax.device_put(
            batch["pix_label"], NamedSharding(mesh, P(None, DATA_AXIS, None)))
        for k in ("waveform", "valid"):
            batch[k] = jax.device_put(batch[k], rep)
        return jitted(variables, metrics, batch)

    return run
