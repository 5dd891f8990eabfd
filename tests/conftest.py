"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4 strategy — same collective
program on an emulated mesh before a real pod slice).

Note: this environment registers a remote-TPU ("axon") PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon; the config update below runs
before any backend is initialized and re-pins tests to host CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
