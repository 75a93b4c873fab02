"""Test configuration: CPU backend with 8 virtual devices for sharding tests,
float64 enabled (the reference's oracle demands 1e-8 agreement, SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# Force CPU: sitecustomize imports jax with JAX_PLATFORMS=axon (remote TPU
# tunnel, ~30s/compile), so the env var is already captured — override the
# config value directly before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(params=[np.float64, np.complex128], ids=["real", "complex"])
def scalar_dtype(request):
    """Mirror of the reference CI's real/complex PETSc scalar matrix
    (.github/workflows/test_mpc.yml:20-27)."""
    return request.param
