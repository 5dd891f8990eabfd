"""Slot-packed encrypted vectors and matrices.

TPU-native re-design of the reference's ``he::linalg::BatchedVector`` /
``BatchedMatrix`` (``he_linalg.h:172-412``, ``he_linalg.cpp:388-1006``):

* a BatchedVector is ONE ciphertext whose CKKS slots hold the vector;
* a BatchedMatrix is ONE **batched** ciphertext ``[d, parts, L, N]`` — the
  reference's ``vector<BatchedVector>`` becomes a leading array axis, so
  every elementwise op is a single fused XLA kernel over the whole matrix,
  and the batch axis is the natural ``pjit`` sharding axis (SURVEY.md §2d);
* the diagonal-method matmul hot loop (``he_linalg.cpp:943-1006``) uses
  HOISTED rotations: the key-switch digit decomposition is computed once
  per input and reused across all rotation steps;
* relinearize+rescale are deferred to once per output (the reference's
  SMART_RELIN=1 — ``he_linalg.cpp:975,999-1002`` — taken further: 3-part
  products are accumulated and a single *batched* relin covers all
  outputs).

Layouts (square d×d, one bvec per leading index):
  col  — bvec j, slot i  =  M[i, j]
  diag — bvec j, slot i  =  M[i, (i+j) mod d]
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
import jax.numpy as jnp

from ..core.ciphertext import Ciphertext
from ..core.modular import mod_add
from ..session import Session


def _tree_mod_add(parts, q):
    """Balanced modular reduction of a list of equally-shaped arrays."""
    xs = list(parts)
    while len(xs) > 1:
        nxt = [mod_add(xs[i], xs[i + 1], q) for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


# ======================================================================
# BatchedVector
# ======================================================================

@dataclass
class BatchedVector:
    """dim values in the slots of one ciphertext (reference
    ``he_linalg.h:172``)."""

    sess: Session
    ct: Ciphertext
    dim: int

    # -- construction --------------------------------------------------
    @classmethod
    def encrypt(cls, sess: Session, values, level=None, scale=None):
        v = np.asarray(values)
        return cls(sess, sess.encrypt(v, level, scale), dim=v.shape[0])

    def decrypt(self) -> np.ndarray:
        return self.sess.decrypt(self.ct)[: self.dim]

    def _wrap(self, ct: Ciphertext, dim=None) -> "BatchedVector":
        return BatchedVector(self.sess, ct, self.dim if dim is None else dim)

    def _coerce(self, other, level, scale):
        """other: BatchedVector → ct; scalar/array → plaintext at level."""
        if isinstance(other, BatchedVector):
            return other.ct, True
        return self.sess.encode(other, level=level, scale=scale), False

    # -- elementwise ops (reference he_linalg.cpp:411-505) -------------
    def __add__(self, other):
        s, ev = self.sess, self.sess.ev
        if isinstance(other, BatchedVector):
            a, b = s.align(self.ct, other.ct)
            return self._wrap(ev.add(a, b))
        return self._wrap(ev.add_plain(self.ct, s.const_like(self.ct, other)))

    def __sub__(self, other):
        s, ev = self.sess, self.sess.ev
        if isinstance(other, BatchedVector):
            a, b = s.align(self.ct, other.ct)
            return self._wrap(ev.sub(a, b))
        return self._wrap(ev.sub_plain(self.ct, s.const_like(self.ct, other)))

    def __neg__(self):
        return self._wrap(self.sess.ev.negate(self.ct))

    def __mul__(self, other):
        """Fused multiply + relin + rescale (reference
        ``mult_relin_rescale`` he_linalg.cpp:556-584)."""
        s, ev = self.sess, self.sess.ev
        if isinstance(other, BatchedVector):
            a, b = s.align(self.ct, other.ct)
            return self._wrap(ev.multiply_relin_rescale(a, b, s.rk))
        pt = s.encode(other, level=self.ct.level)
        return self._wrap(ev.rescale(ev.multiply_plain(self.ct, pt)))

    __radd__ = __add__
    __rmul__ = __mul__

    def square(self) -> "BatchedVector":
        return self._wrap(self.sess.ev.square_relin_rescale(self.ct, self.sess.rk))

    # -- rotations (reference he_linalg.cpp:589-638) -------------------
    def rotate(self, steps: int) -> "BatchedVector":
        """Slots left by `steps` (negative → right)."""
        return self._wrap(self.sess.ev.rotate(self.ct, steps, self.sess.gk))

    def __lshift__(self, steps: int):
        return self.rotate(steps)

    def __rshift__(self, steps: int):
        return self.rotate(-steps)

    # -- reductions ----------------------------------------------------
    def sum_elems(self) -> "BatchedVector":
        """Log-depth rotate-and-add; total lands in slot 0.  Handles
        non-power-of-2 dims by bitwise block decomposition — behavioral
        parity with reference ``he_linalg.cpp:667-713`` (including the
        quirk that slots ≠ 0 hold partial sums; use ``mask`` to isolate —
        the reference's FIXME at ``matrix_operations.cpp:951``)."""
        ev, gk = self.sess.ev, self.sess.gk
        dim = self.dim
        acc = None
        window = 0
        for b in reversed(range(dim.bit_length())):
            if not (dim >> b) & 1:
                continue
            block = self.ct if window == 0 else ev.rotate(self.ct, window, gk)
            for i in reversed(range(b)):
                block = ev.add(block, ev.rotate(block, 1 << i, gk))
            acc = block if acc is None else ev.add(acc, block)
            window += 1 << b
        return self._wrap(acc, dim=1)

    def mask(self, keep_slots) -> "BatchedVector":
        """Multiply by a 0/1 indicator (consumes one level) — isolates
        slots, e.g. the post-sum_elems cleanup."""
        m = np.zeros(self.sess.slots)
        m[np.asarray(keep_slots)] = 1.0
        pt = self.sess.encode(m, level=self.ct.level)
        return self._wrap(self.sess.ev.rescale(
            self.sess.ev.multiply_plain(self.ct, pt)))

    def replicate_slot0(self, out_dim: int) -> "BatchedVector":
        """Broadcast slot 0's value to slots [0, out_dim): mask + log-depth
        rotate-accumulate (utility the reference lacks but least-squares
        wants)."""
        v = self.mask([0])
        ev, gk = self.sess.ev, self.sess.gk
        ct = v.ct
        span = 1
        while span < out_dim:
            ct = ev.add(ct, ev.rotate(ct, -span, gk))
            span *= 2
        return self._wrap(ct, dim=out_dim)


# ======================================================================
# BatchedMatrix
# ======================================================================

@dataclass
class BatchedMatrix:
    """Square d×d matrix as a [d]-batched ciphertext (reference
    ``he_linalg.h:307-412``)."""

    sess: Session
    ct: Ciphertext                 # data [d, parts, L, N]
    d: int
    layout: str = "col"            # "col" | "diag"

    @classmethod
    def encrypt(cls, sess: Session, mat: np.ndarray, layout: str = "col",
                level=None, scale=None) -> "BatchedMatrix":
        mat = np.asarray(mat, dtype=np.complex128)
        d = mat.shape[0]
        if mat.shape != (d, d):
            raise ValueError("BatchedMatrix is square")
        rows = []
        for j in range(d):
            vec = mat[:, j] if layout == "col" else \
                np.array([mat[i, (i + j) % d] for i in range(d)])
            # tile twice so slot rotations wrap mod d (the Halevi-Shoup
            # replication trick; exact wrap when d == slot count)
            if 2 * d <= sess.slots:
                vec = np.tile(vec, 2)
            rows.append(sess.encrypt(vec, level, scale).data)
        base = sess.encrypt(np.zeros(d), level, scale)
        return cls(sess, base.with_(data=jnp.stack(rows)), d=d, layout=layout)

    def decrypt(self) -> np.ndarray:
        d = self.d
        out = np.zeros((d, d), dtype=np.complex128)
        for j in range(d):
            vals = self.sess.decrypt(self.ct.with_(data=self.ct.data[j]))[:d]
            if self.layout == "col":
                out[:, j] = vals
            else:
                for i in range(d):
                    out[i, (i + j) % d] = vals[i]
        return out

    def _wrap(self, ct, layout) -> "BatchedMatrix":
        return BatchedMatrix(self.sess, ct, self.d, layout)

    # -- elementwise (delegates to the batch axis, one kernel) ---------
    def __add__(self, other: "BatchedMatrix"):
        if self.layout != other.layout:
            raise ValueError("layout mismatch")
        a, b = self.sess.align(self.ct, other.ct)
        return self._wrap(self.sess.ev.add(a, b), self.layout)

    def __sub__(self, other: "BatchedMatrix"):
        if self.layout != other.layout:
            raise ValueError("layout mismatch")
        a, b = self.sess.align(self.ct, other.ct)
        return self._wrap(self.sess.ev.sub(a, b), self.layout)

    def __neg__(self):
        return self._wrap(self.sess.ev.negate(self.ct), self.layout)

    def hadamard(self, other: "BatchedMatrix"):
        if self.layout != other.layout:
            raise ValueError("layout mismatch")
        a, b = self.sess.align(self.ct, other.ct)
        return self._wrap(self.sess.ev.multiply_relin_rescale(a, b, self.sess.rk),
                          self.layout)

    def square_elems(self):
        return self._wrap(self.sess.ev.square_relin_rescale(self.ct, self.sess.rk),
                          self.layout)

    # -- the rotation matmul (reference he_linalg.cpp:943-1006) --------
    def matmul(self, other: "BatchedMatrix") -> "BatchedMatrix":
        """diag×col → col (Halevi-Shoup):  C[:,j] = Σ_k diag_k(A) ⊙
        rot(B[:,j], k).  One hoisted decomposition of B's whole batch
        serves every rotation step; products stay 3-part until one final
        batched relin+rescale."""
        sess, ev = self.sess, self.sess.ev
        if self.layout != "diag" or other.layout != "col":
            raise ValueError("matmul needs self=diag, other=col "
                             "(use matmul_cols_t for col×col)")
        a, b = sess.align(self.ct, other.ct)
        d = self.d
        q = sess.ctx.mont(a.level)["q"]
        rots = ev.rotate_hoisted(b, list(range(d)), sess.gk)  # batched over cols
        prods = []
        for k in range(d):
            ak = a.with_(data=a.data[k])                      # diag_k(A)
            prods.append(ev.multiply(rots[k], ak).data)        # [d, 3, L, N]
        acc = _tree_mod_add(prods, q)
        c3 = Ciphertext(data=acc, level=a.level, scale=a.scale * b.scale)
        out = ev.rescale(ev.relinearize(c3, sess.rk))
        return self._wrap(out, "col")

    def matmul_cols_t(self, other: "BatchedMatrix") -> "BatchedMatrix":
        """col×col → A·Bᵀ in diag layout (the reference's col×colᵀ path):
        out_diag_i = Σ_j col_j(A) ⊙ rot(col_j(B), i)."""
        sess, ev = self.sess, self.sess.ev
        if self.layout != "col" or other.layout != "col":
            raise ValueError("matmul_cols_t needs both operands in col layout")
        a, b = sess.align(self.ct, other.ct)
        d = self.d
        q = sess.ctx.mont(a.level)["q"]
        rots = ev.rotate_hoisted(b, list(range(d)), sess.gk)  # [d]-batched each
        outs = []
        for i in range(d):
            prod3 = ev.multiply(rots[i], a)                   # [d, 3, L, N]
            summed = _tree_mod_add([prod3.data[j] for j in range(d)], q)
            outs.append(summed)
        c3 = Ciphertext(data=jnp.stack(outs), level=a.level,
                        scale=a.scale * b.scale)
        out = ev.rescale(ev.relinearize(c3, sess.rk))
        return self._wrap(out, "diag")
