"""Encrypted linear algebra (reference ``he::linalg`` — he_linalg.h)."""

from .batched import BatchedMatrix, BatchedVector
from .matrix import Matrix

__all__ = ["BatchedMatrix", "BatchedVector", "Matrix"]
