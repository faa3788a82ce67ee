"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on
XLA's host-platform device emulation instead (SURVEY.md §4d).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep the Pallas kernels out of the default CPU test path; kernel tests
# opt in via interpret mode explicitly.
os.environ.setdefault("PGT_SPMM_BACKEND", "xla")
os.environ.setdefault("PGT_SPMM_DTYPE", "float32")  # parity tolerances

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects itself as the default
# platform regardless of JAX_PLATFORMS; override before backends initialize.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare against f32 torch numerics.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
