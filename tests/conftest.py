"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh collectives, sharded index) execute without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (remote TPU tunnel), so env vars set here are too
late — the platform must be overridden through jax.config before the
backend is first used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
