"""CAVP-TPU: a TPU-native audio-visual segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the CAVP
reference codebase (CVPR'24 "Unraveling Instance Associations: A Closer
Look for Audio-Visual Segmentation"). The compute path is pure JAX
(flax modules, jitted train/eval steps, Pallas kernels for the audio
frontend and fusion hot ops); scale-out is expressed as shardings over a
`jax.sharding.Mesh` rather than NCCL process groups.

Package map (each module's docstring cites the reference files whose
capability it rebuilds):

- ``cavp_tpu.config``   : setup registry + CLI flags (reference: config/)
- ``cavp_tpu.audio``    : log-mel frontends (reference: torchvggish/, trainer mel)
- ``cavp_tpu.models``   : flax model zoo (reference: models/)
- ``cavp_tpu.losses``   : CE + contrastive objectives (reference: loss/)
- ``cavp_tpu.metrics``  : on-device segmentation metrics (reference: utils/*_utils.py)
- ``cavp_tpu.parallel`` : mesh/sharding/collectives (reference: DDP machinery)
- ``cavp_tpu.data``     : host input pipelines (reference: dataset/)
- ``cavp_tpu.engine``   : optimizers, schedules, train/eval loops, checkpointing
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a preinstalled PJRT plugin (e.g. the
# axon TPU tunnel) registers itself ahead of the env var: the plugin
# wins over the env var alone, so pin the platform through the config
# API. Lets `JAX_PLATFORMS=cpu python main_avss.py ...` behave as
# documented on any host.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
