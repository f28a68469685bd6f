"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of the reference's gloo-on-localhost multi-process
testing (`scripts/example/*.sh`): `xla_force_host_platform_device_count=8`
gives shard_map/all_to_all paths 8 fake devices without TPU hardware
(SURVEY.md §4c).  Must run before `import jax`.
"""
import os

# Force-override: the environment ships JAX_PLATFORMS=axon (TPU tunnel);
# the test suite must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter start
# regardless of JAX_PLATFORMS; this forces the virtual CPU mesh anyway.
jax.config.update("jax_platforms", "cpu")

# A no-op on this CPU-only process unless ADAQP_JAX_CACHE forces a dir:
# replaying XLA:CPU executables trips a false-positive SIGILL warning on
# every load and buys no suite time (utils/compilation_cache module doc).
from adaqp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
