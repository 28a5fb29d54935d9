"""Test harness: force a local 8-device virtual CPU mesh.

The environment's sitecustomize registers the `axon` remote-TPU plugin and
sets jax_platforms="axon,cpu" via jax.config in EVERY python process —
env-var JAX_PLATFORMS is overridden. Tests must run on local CPU (the
remote tunnel serializes processes and compiles remotely), so we re-update
the config after import, before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt and braces

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
