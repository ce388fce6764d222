"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is tested on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) exactly as SURVEY.md §4
prescribes; the real TPU is exercised by bench.py, not the unit tests.
Must run before jax initialises its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the env, so setting the env var here is too
# late — override via the config API instead (backends are not yet
# instantiated when conftest runs).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_wave():
    """One second of synthetic 'voiced speech' at 16 kHz with varying f0."""
    sr = 16000
    t = np.arange(sr) / sr
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wave = (0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase) + 0.12 * np.sin(3 * phase))
    return wave.astype(np.float32), sr
