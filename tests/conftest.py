"""Test env: force CPU jax with an 8-device virtual mesh.

Must run before jax is first imported anywhere (SURVEY.md §4: the jax-native
way to exercise multi-device code without a cluster).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS;
# jax.config wins over both, so force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiles
# (the big model-forward tests dominate suite time on a 1-CPU host).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mock_tokenizer():
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    return MockTokenizer()
