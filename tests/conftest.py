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


@pytest.fixture(
    params=[np.float32, np.float64, np.complex64, np.complex128],
    ids=["f32", "f64", "c64", "c128"],
)
def full_scalar_dtype(request):
    """All four PETSc scalar types of the reference CI matrix
    (.github/workflows/test_mpc.yml:20-27).  f32 is the actual on-chip TPU
    dtype — tests/test_dtypes.py drives the pipeline through it with
    dtype-appropriate tolerances."""
    return request.param


def dtype_tol(dtype) -> float:
    """Oracle tolerance per scalar type (f32 kernels accumulate ~1e-5)."""
    single = np.dtype(dtype) in (np.dtype(np.float32), np.dtype(np.complex64))
    return 2e-4 if single else 1e-8


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running scale tests")
