"""Test configuration: force the CPU backend with 8 virtual devices so
data-parallel sharding semantics are testable without a TPU pod.

Note: the axon TPU plugin rewrites JAX_PLATFORMS at interpreter start, so the
platform must be forced via jax.config (works pre-backend-init)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
