"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding tests simulate
a TPU mesh per the driver's dry-run contract) and with x64 enabled — the
reference test suite is Float64 (``test/runtests.jl``); Float32 coverage is
exercised explicitly where the reference does.

Note: the session environment pins JAX to the TPU tunnel (JAX_PLATFORMS=
axon); the env var alone does not override it, so we force the platform via
``jax.config`` before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from landhydrology_tpu.constants import default_earth_param_set  # noqa: E402


@pytest.fixture
def param_set():
    return default_earth_param_set
