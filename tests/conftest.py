"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): XLA host platform with 8 virtual devices lets the pjit
sharding paths compile and execute exactly as they would on a v5e-8.
Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins "axon"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin and wins over the env
# var alone; the config update pins CPU reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: CPU compiles of the conv towers are slow;
# cache across test sessions.
from cavp_tpu.utils.hostfp import set_compile_cache
set_compile_cache("/tmp/jax_test_cache", min_compile_secs=1.0)
