"""Pallas key-switch inner product (ip_kernel): bit-exact vs jnp path.

Runs the kernel in interpret mode on the CPU mesh so the kernel body's
logic (grid layout, key-block reuse indexing, accumulation order) is
covered by the default suite; the TPU tier (test_tpu_e2e) covers the
compiled kernel.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hetpu.core import ip_kernel


@pytest.mark.parametrize("lead", [(), (3,)])
def test_ip_kernel_bit_exact(lead):
    J, R, N = 2, 5, 256
    rng = np.random.default_rng(7)
    q = (rng.integers(1 << 29, 1 << 30, R, dtype=np.uint32) | 1).reshape(R, 1)
    ext = jnp.asarray(
        rng.integers(0, q.min(), (*lead, J, R, N), dtype=np.uint32))
    k = jnp.asarray(rng.integers(0, q.min(), (J, 2, R, N), dtype=np.uint32))
    ks = jnp.asarray(
        ((k.astype(np.uint64) << 32) // jnp.asarray(q.astype(np.uint64)))
        .astype(np.uint32))
    ref = ip_kernel.inner_product_jnp(ext, k, ks, jnp.asarray(q))

    old_force, old_interp = ip_kernel._FORCE, ip_kernel._INTERPRET
    ip_kernel._FORCE, ip_kernel._INTERPRET = True, True
    try:
        got = ip_kernel.inner_product(ext, k, ks, q)
    finally:
        ip_kernel._FORCE, ip_kernel._INTERPRET = old_force, old_interp
    assert got.shape == ref.shape
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_ip_kernel_fallback_non128():
    """N not a lane multiple falls back to the jnp path unchanged."""
    J, R, N = 2, 3, 96
    rng = np.random.default_rng(3)
    q = np.full((R, 1), (1 << 29) + 3, dtype=np.uint32)
    ext = jnp.asarray(rng.integers(0, q[0, 0], (J, R, N), dtype=np.uint32))
    k = jnp.asarray(rng.integers(0, q[0, 0], (J, 2, R, N), dtype=np.uint32))
    ks = jnp.asarray(((k.astype(np.uint64) << 32) // int(q[0, 0]))
                     .astype(np.uint32))
    old = ip_kernel._FORCE
    ip_kernel._FORCE = True
    try:
        got = ip_kernel.inner_product(ext, k, ks, jnp.asarray(q))
    finally:
        ip_kernel._FORCE = old
    ref = ip_kernel.inner_product_jnp(ext, k, ks, jnp.asarray(q))
    assert np.array_equal(np.asarray(got), np.asarray(ref))
