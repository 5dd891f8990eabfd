"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4 strategy — same collective
program on an emulated mesh before a real pod slice).

Note: this environment registers a remote-TPU ("axon") PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon; the config update below runs
before any backend is initialized and re-pins tests to host CPU.
"""

import os

_ON_TPU = os.environ.get("HETPU_TEST_TPU", "") not in ("", "0")

flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _ON_TPU:
    # Pin the platform BEFORE importing jax: the axon remote-TPU PJRT
    # plugin registers itself at import (sitecustomize) and the suite can
    # wedge against the relay if the plugin ever wins backend selection
    # (VERDICT r3 weakness #6).  env var beats any later config update.
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    # belt-and-braces: 8 virtual CPU devices (HETPU_TEST_TPU=1 keeps the
    # real backend for `pytest -m tpu` hardware tests)
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite's wall-clock is dominated by XLA CPU
# compiles (every (op, level, shape) pair is a distinct executable); cache
# them across runs so repeat invocations are fast.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HETPU_TEST_CACHE",
                                 "/tmp/hetpu_jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Smoke tier (VERDICT r2 item 6): every test in these modules is fast —
# pure-kernel math at tiny N, no deep-chain keygen.  `pytest -m smoke`
# finishes in ~1 min; the remaining modules are the `full` tier
# (documented < 15 min with a warm /tmp/hetpu_jax_cache_cpu).
_SMOKE_MODULES = {
    "test_modular", "test_rns", "test_ntt", "test_dsl", "test_twofloat",
    "test_aux",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        marked = set(item.keywords)
        if "smoke" not in marked and "full" not in marked:
            if mod in _SMOKE_MODULES:
                item.add_marker(pytest.mark.smoke)
            else:
                item.add_marker(pytest.mark.full)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
