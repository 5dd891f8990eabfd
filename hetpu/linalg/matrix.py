"""Element-per-ciphertext encrypted matrices.

Re-design of reference ``he::linalg::Matrix`` (``he_linalg.h:47-168``,
``he_linalg.cpp:10-384``): the reference keeps ``vector<seal::Ciphertext>``
and loops per element; here the m×n elements are ONE batched ciphertext
``[m·n, parts, L, N]`` so elementwise ops are one fused kernel and matmul
is a gather + batched-multiply + tree-reduction + ONE batched relin+rescale
(the reference relins per output element — ``he_linalg.cpp:202-236``).

Lazy transpose parity: a bool flag + index remap, zero data movement
(reference ``transp()`` ``he_linalg.cpp:35-38``, ``ij_to_idx`` ``:376-384``).
Each element's ciphertext may itself be slot-batched — thousands of
independent matrices in one Matrix (reference ``batch_matmul`` demos).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..core.ciphertext import Ciphertext
from ..core.modular import mod_add
from ..session import Session
from .batched import _tree_mod_add


@dataclass
class Matrix:
    sess: Session
    ct: Ciphertext                  # [m*n, parts, L, N]
    rows: int
    cols: int
    transposed: bool = False

    # -- construction --------------------------------------------------
    @classmethod
    def encrypt(cls, sess: Session, mat, level=None, scale=None) -> "Matrix":
        """mat: [m, n] scalars, or [m, n, b] → slot-batch of b independent
        matrices per the reference's batch_matmul demos."""
        mat = np.asarray(mat)
        m, n = mat.shape[:2]
        elems = [sess.encrypt(mat[i, j], level, scale).data
                 for i in range(m) for j in range(n)]
        base = sess.encrypt(0.0, level, scale)
        return cls(sess, base.with_(data=jnp.stack(elems)), rows=m, cols=n)

    def get_dims(self):
        return (self.cols, self.rows) if self.transposed else (self.rows, self.cols)

    def _idx(self, i: int, j: int) -> int:
        """Logical (i,j) → storage index, honoring the lazy transpose
        (reference ``ij_to_idx`` he_linalg.cpp:376-379)."""
        if self.transposed:
            i, j = j, i
        return i * self.cols + j

    def transp(self) -> "Matrix":
        return Matrix(self.sess, self.ct, self.rows, self.cols,
                      not self.transposed)

    def decrypt(self, slot: int = 0) -> np.ndarray:
        m, n = self.get_dims()
        out = np.zeros((m, n), dtype=np.complex128)
        for i in range(m):
            for j in range(n):
                d = self.ct.data[self._idx(i, j)]
                out[i, j] = self.sess.decrypt(self.ct.with_(data=d))[slot]
        return out

    def decrypt_exact(self, batch: int = 1) -> np.ndarray:
        """Exact integer decrypt (BFV sessions): [m, n] object ints, or
        [m, n, batch] when each element is slot-batched."""
        m, n = self.get_dims()
        out = np.zeros((m, n, batch), dtype=object)
        for i in range(m):
            for j in range(n):
                d = self.ct.data[self._idx(i, j)]
                out[i, j] = self.sess.decrypt(self.ct.with_(data=d))[:batch]
        return out[..., 0] if batch == 1 else out

    def decrypt_batch(self, batch: int) -> np.ndarray:
        """[m, n, batch] — all slot-batched instances."""
        m, n = self.get_dims()
        out = np.zeros((m, n, batch), dtype=np.complex128)
        for i in range(m):
            for j in range(n):
                d = self.ct.data[self._idx(i, j)]
                out[i, j] = self.sess.decrypt(self.ct.with_(data=d))[:batch]
        return out

    # -- elementwise (reference he_linalg.cpp:68-197) ------------------
    def _aligned(self, other: "Matrix"):
        if self.get_dims() != other.get_dims():
            raise ValueError("dim mismatch")
        return self.sess.align(self.ct, other.ct)

    def _perm(self) -> np.ndarray:
        m, n = self.get_dims()
        return np.array([self._idx(i, j) for i in range(m) for j in range(n)])

    def _data_logical(self, ct: Ciphertext):
        """Data gathered into logical (row-major, untransposed) order."""
        return ct.data[self._perm()] if self.transposed else ct.data

    def __add__(self, other: "Matrix"):
        a, b = self._aligned(other)
        da, db = self._data_logical(a), other._data_logical(b)
        m, n = self.get_dims()
        out = self.sess.ev.add(a.with_(data=da), b.with_(data=db))
        return Matrix(self.sess, out, m, n)

    def __sub__(self, other: "Matrix"):
        a, b = self._aligned(other)
        da, db = self._data_logical(a), other._data_logical(b)
        m, n = self.get_dims()
        out = self.sess.ev.sub(a.with_(data=da), b.with_(data=db))
        return Matrix(self.sess, out, m, n)

    def __neg__(self):
        return Matrix(self.sess, self.sess.ev.negate(self.ct), self.rows,
                      self.cols, self.transposed)

    def hadamard(self, other: "Matrix"):
        a, b = self._aligned(other)
        da, db = self._data_logical(a), other._data_logical(b)
        m, n = self.get_dims()
        out = self.sess.mat_mult_finish(a.with_(data=da), b.with_(data=db))
        return Matrix(self.sess, out, m, n)

    # -- matmul (reference he_linalg.cpp:202-236, naive O(mnp) inner
    #    products — here: one batched multiply + tree reduce + one relin) --
    def matmul(self, other: "Matrix") -> "Matrix":
        sess, ev = self.sess, self.sess.ev
        m, n = self.get_dims()
        n2, p = other.get_dims()
        if n != n2:
            raise ValueError(f"matmul inner dim: {n} vs {n2}")
        a, b = sess.align(self.ct, other.ct)
        # gather indices: A[i,k] repeated over j; B[k,j] repeated over i
        ia = np.array([self._idx(i, k)
                       for i in range(m) for j in range(p) for k in range(n)])
        ib = np.array([other._idx(k, j)
                       for i in range(m) for j in range(p) for k in range(n)])
        prod = sess.mat_multiply(a.with_(data=a.data[ia]),
                                 b.with_(data=b.data[ib]))
        # reduce over k: [m*p, n, 3, L, N] summed on axis 1
        d = prod.data.reshape(m * p, n, *prod.data.shape[1:])
        q = sess.ctx.mont(prod.level)["q"]
        acc = _tree_mod_add([d[:, k] for k in range(n)], q)
        c3 = prod.with_(data=acc)
        out = sess.mat_reduce_finish(c3)
        return Matrix(sess, out, m, p)

    def left_matmul_with_transp(self) -> "Matrix":
        """AᵀA without materializing the transpose (reference
        ``he_linalg.cpp:241-273``)."""
        return self.transp().matmul(self)

    def matmul_square(self) -> "Matrix":
        """A·A (reference ``he_linalg.cpp:278-311``)."""
        m, n = self.get_dims()
        if m != n:
            raise ValueError("matmul_square needs a square matrix")
        return self.matmul(self)

    def matmul_pow(self, exponent: int) -> "Matrix":
        """A^k by binary square-and-multiply (reference
        ``he_linalg.cpp:316-349``)."""
        if exponent < 1:
            raise ValueError("exponent must be >= 1")
        m, n = self.get_dims()
        if m != n:
            raise ValueError("matmul_pow needs a square matrix")
        result = None
        base = self
        e = exponent
        while e:
            if e & 1:
                result = base if result is None else result.matmul(base)
            e >>= 1
            if e:
                base = base.matmul_square()
        return result
