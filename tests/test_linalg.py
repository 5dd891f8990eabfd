"""Encrypted linear algebra vs plain numpy — the reference's matrix demos
(``matrix_operations.cpp``) as automated tolerance tests."""

import numpy as np
import pytest

from hetpu.linalg import BatchedMatrix, BatchedVector, Matrix
from hetpu.session import Session
from hetpu.utils.keycache import cached_session

SEED = b"\x02" * 32


@pytest.fixture(scope="module")
def sess():
    return cached_session(
        "test_tiny", seed=SEED,
        galois_steps=[1, 2, 3, 4, 5, 6, 7, 8, -1, -2, -4, -8, -16],
    )


def test_batched_vector_elementwise(sess, rng):
    x = rng.uniform(-1, 1, 16)
    y = rng.uniform(-1, 1, 16)
    bx = BatchedVector.encrypt(sess, x)
    by = BatchedVector.encrypt(sess, y)
    np.testing.assert_allclose((bx + by).decrypt().real, x + y, atol=1e-4)
    np.testing.assert_allclose((bx - by).decrypt().real, x - y, atol=1e-4)
    np.testing.assert_allclose((bx * by).decrypt().real, x * y, atol=1e-3)
    np.testing.assert_allclose((bx * 2.5).decrypt().real, x * 2.5, atol=1e-3)
    np.testing.assert_allclose((bx + 1.0).decrypt().real, x + 1, atol=1e-4)
    np.testing.assert_allclose((-bx).decrypt().real, -x, atol=1e-4)
    np.testing.assert_allclose(bx.square().decrypt().real, x * x, atol=1e-3)


def test_batched_vector_rotate(sess, rng):
    x = rng.uniform(-1, 1, sess.slots)
    bx = BatchedVector.encrypt(sess, x)
    np.testing.assert_allclose((bx << 3).decrypt().real, np.roll(x, -3),
                               atol=1e-4)
    np.testing.assert_allclose((bx >> 2).decrypt().real, np.roll(x, 2),
                               atol=1e-4)


def test_sum_elems_non_pow2(sess, rng):
    """dim=10 reduction — reference ``sum_elems`` demo
    (matrix_operations.cpp:745-831) and the he_linalg.cpp:667-713 bitwise
    decomposition."""
    for dim in (10, 8, 7, 1):
        x = np.zeros(sess.slots)
        x[:dim] = rng.uniform(-1, 1, dim)
        bx = BatchedVector.encrypt(sess, x)
        bx.dim = dim
        got = bx.sum_elems().decrypt().real[0]
        np.testing.assert_allclose(got, x.sum(), atol=1e-3)


def test_mask_and_replicate(sess, rng):
    x = rng.uniform(-1, 1, 8)
    bx = BatchedVector.encrypt(sess, x)
    m = bx.mask([0]).decrypt().real
    np.testing.assert_allclose(m[0], x[0], atol=1e-3)
    np.testing.assert_allclose(m[1:], 0, atol=1e-3)
    r = bx.replicate_slot0(8).decrypt().real
    np.testing.assert_allclose(r, np.full(8, x[0]), atol=1e-3)


def test_batched_matrix_roundtrip(sess, rng):
    a = rng.uniform(-1, 1, (4, 4))
    for layout in ("col", "diag"):
        m = BatchedMatrix.encrypt(sess, a, layout=layout)
        np.testing.assert_allclose(m.decrypt().real, a, atol=1e-4)


def test_batched_matmul_diag_col(sess, rng):
    """Halevi-Shoup diagonal matmul (reference he_linalg.cpp:943-1006,
    diag×col path) with hoisted rotations."""
    a = rng.uniform(-1, 1, (4, 4))
    b = rng.uniform(-1, 1, (4, 4))
    ma = BatchedMatrix.encrypt(sess, a, layout="diag")
    mb = BatchedMatrix.encrypt(sess, b, layout="col")
    got = ma.matmul(mb).decrypt().real
    np.testing.assert_allclose(got, a @ b, atol=1e-2)


def test_batched_matmul_cols_t(sess, rng):
    """col×col → A·Bᵀ in diag layout (reference col×colᵀ path)."""
    a = rng.uniform(-1, 1, (4, 4))
    b = rng.uniform(-1, 1, (4, 4))
    ma = BatchedMatrix.encrypt(sess, a, layout="col")
    mb = BatchedMatrix.encrypt(sess, b, layout="col")
    got = ma.matmul_cols_t(mb).decrypt().real
    np.testing.assert_allclose(got, a @ b.T, atol=1e-2)


def test_matrix_elementwise_and_transpose(sess, rng):
    a = rng.uniform(-1, 1, (2, 3))
    b = rng.uniform(-1, 1, (2, 3))
    ma = Matrix.encrypt(sess, a)
    mb = Matrix.encrypt(sess, b)
    np.testing.assert_allclose((ma + mb).decrypt().real, a + b, atol=1e-4)
    np.testing.assert_allclose((ma - mb).decrypt().real, a - b, atol=1e-4)
    np.testing.assert_allclose(ma.hadamard(mb).decrypt().real, a * b, atol=1e-3)
    np.testing.assert_allclose(ma.transp().decrypt().real, a.T, atol=1e-4)


def test_matrix_matmul(sess, rng):
    a = rng.uniform(-1, 1, (2, 3))
    b = rng.uniform(-1, 1, (3, 2))
    got = Matrix.encrypt(sess, a).matmul(Matrix.encrypt(sess, b)).decrypt().real
    np.testing.assert_allclose(got, a @ b, atol=1e-3)


def test_matrix_matmul_transposed_operand(sess, rng):
    """Lazy-transpose feeding matmul (reference AᵀA path,
    he_linalg.cpp:241-273)."""
    a = rng.uniform(-1, 1, (3, 2))
    ma = Matrix.encrypt(sess, a)
    got = ma.left_matmul_with_transp().decrypt().real
    np.testing.assert_allclose(got, a.T @ a, atol=1e-3)


def test_matrix_matmul_pow(sess, rng):
    """A^3 binary exponentiation (reference matpow demo,
    matrix_operations.cpp:631-743; he_linalg.cpp:316-349)."""
    a = rng.uniform(-0.6, 0.6, (2, 2))
    got = Matrix.encrypt(sess, a).matmul_pow(3).decrypt().real
    np.testing.assert_allclose(got, a @ a @ a, atol=1e-2)


def test_matrix_slot_batched(sess, rng):
    """Thousands of independent matmuls in the slots — the reference's
    batch_matmul demos (matrix_operations.cpp:351-629).  Here: 16 instances
    of a 3×3 matmul in one Matrix."""
    batch = 16
    a = rng.uniform(-1, 1, (3, 3, batch))
    b = rng.uniform(-1, 1, (3, 3, batch))
    ma = Matrix.encrypt(sess, a)
    mb = Matrix.encrypt(sess, b)
    got = ma.matmul(mb).decrypt_batch(batch).real
    want = np.einsum("ikb,kjb->ijb", a, b)
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_batched_matrix_rectangular(sess, rng):
    """Non-square col layout + rectangular diag×col matmul (reference
    supports non-square dims via get_col_dim/get_row_dim,
    he_linalg.h:318-330)."""
    a = rng.uniform(-1, 1, (4, 4))
    b = rng.uniform(-1, 1, (4, 2))
    ma = BatchedMatrix.encrypt(sess, a, layout="diag")
    mb = BatchedMatrix.encrypt(sess, b, layout="col")
    assert (mb.row_dim, mb.col_dim) == (4, 2)
    out = ma.matmul(mb)
    assert (out.row_dim, out.col_dim) == (4, 2)
    np.testing.assert_allclose(out.decrypt().real, a @ b, atol=1e-2)


def test_batched_matrix_transp_flag(sess, rng):
    """Lazy transpose flag parity: matmul dispatches the col×colᵀ path when
    other.transp() is set (reference he_linalg.cpp:947-973, demo
    matrix_operations.cpp:1125-1128)."""
    a = rng.uniform(-1, 1, (4, 4))
    b = rng.uniform(-1, 1, (4, 4))
    ma = BatchedMatrix.encrypt(sess, a, layout="col")
    mb = BatchedMatrix.encrypt(sess, b, layout="col")
    mbt = mb.transp()
    assert mbt.row_dim == 4 and mbt.transposed
    np.testing.assert_allclose(mbt.decrypt().real, b.T, atol=1e-4)
    got = ma.matmul(mbt).decrypt().real
    np.testing.assert_allclose(got, a @ b.T, atol=1e-2)
    with np.testing.assert_raises(ValueError):
        ma.matmul(mb)          # col×col without transp must be rejected
