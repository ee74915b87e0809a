"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding is
exercised without TPU hardware (the reference had no multi-device testing
story at all — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon (TPU)

import jax  # noqa: E402

# The axon plugin re-adds itself to jax_platforms regardless of the env var,
# so force the config directly before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is XLA:CPU-compile-bound (U-Net
# train-step variants take 30-90 s each to build); caching executables on
# disk makes re-runs compile-free.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
