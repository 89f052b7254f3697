"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy of running GPU-free in CI
(reference: .github/workflows/build-ubuntu.yml:226) — we force the JAX CPU
backend with 8 virtual devices so sharding/collective code paths are
exercised without TPU hardware.
"""

import os

# Force the CPU backend: the ambient environment pins JAX_PLATFORMS=axon
# (the tunneled TPU), which would route every eager op through a remote
# compile — tests must run on the local virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: XLA:CPU compiles each distinct op/program in
# ~1s; caching makes repeat test runs fast.
import jax

# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon
# already captured; config.update overrides the frozen env snapshot.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# NOTE: do NOT enable "all" here — persisting XLA:CPU AOT executables is
# machine-feature-sensitive and aborts the process when an entry compiled
# under different detected CPU features is deserialized (observed as a
# segfault inside compilation_cache.get_executable_and_time).

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
