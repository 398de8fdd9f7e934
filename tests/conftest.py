"""Test configuration: fp64 numerics + an 8-device virtual CPU mesh.

Numerics tests run on the default backend (the tunneled TPU supports fp64;
plain CPU otherwise).  Sharding tests build their mesh explicitly from
``jax.devices("cpu")`` — the XLA flag below forces 8 virtual host devices so
multi-chip paths compile and execute without 8 real chips.  Env must be set
before the first jax import.  Note: the axon TPU plugin ignores the
``JAX_PLATFORMS`` env var; use ``jax.config.update("jax_platforms", ...)`` if
a CPU-only run is ever needed.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# Eager dispatch is very slow in this environment; persistently cache all
# compilations so repeated test runs stay fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(586)
