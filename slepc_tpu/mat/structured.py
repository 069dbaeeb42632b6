"""Structured block matrices: 2x2 tiles and BSE Hamiltonians.

Reference: src/sys/mat/matutil.c MatCreateTile (2x2 block assembly used by
PEP linearization and SVD cyclic) and src/sys/mat/matstruct.c MatCreateBSE
(H = [R C; -C^H -R^T] Bethe-Salpeter structure consumed by the
structure-preserving EPS BSE solvers).  Here a block structure is a shell
operator over stacked vectors — no assembly, the blocks apply in place.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .linop import LinearOperator, ShellOperator


def create_tile(a, A: Optional[LinearOperator], b, B: Optional[LinearOperator],
                c, C: Optional[LinearOperator], d, D: Optional[LinearOperator]
                ) -> ShellOperator:
    """G = [a*A b*B; c*C d*D] acting on stacked vectors (None block = 0).

    Reference: MatCreateTile, src/sys/mat/matutil.c:207.
    """
    ops = [op for op in (A, B, C, D) if op is not None]
    if not ops:
        raise ValueError("at least one block required")
    m1 = next(op.shape[0] for op in (A, B) if op is not None)
    m2 = next(op.shape[0] for op in (C, D) if op is not None)
    n1 = next(op.shape[1] for op in (A, C) if op is not None)
    n2 = next(op.shape[1] for op in (B, D) if op is not None)
    dtype = np.result_type(*[op.dtype for op in ops])
    nnz = sum(op.nnz for op in ops)

    def matvec(x):
        x1, x2 = x[:n1], x[n1:]
        y1 = jnp.zeros((m1,) + x.shape[1:], dtype=jnp.result_type(dtype, x.dtype))
        y2 = jnp.zeros((m2,) + x.shape[1:], dtype=y1.dtype)
        if A is not None:
            y1 = y1 + a * A.mult(x1)
        if B is not None:
            y1 = y1 + b * B.mult(x2)
        if C is not None:
            y2 = y2 + c * C.mult(x1)
        if D is not None:
            y2 = y2 + d * D.mult(x2)
        return jnp.concatenate([y1, y2], axis=0)

    def rmatvec(x):
        x1, x2 = x[:m1], x[m1:]
        y1 = jnp.zeros((n1,) + x.shape[1:], dtype=jnp.result_type(dtype, x.dtype))
        y2 = jnp.zeros((n2,) + x.shape[1:], dtype=y1.dtype)
        if A is not None:
            y1 = y1 + np.conj(a) * A.mult_h(x1)
        if C is not None:
            y1 = y1 + np.conj(c) * C.mult_h(x2)
        if B is not None:
            y2 = y2 + np.conj(b) * B.mult_h(x1)
        if D is not None:
            y2 = y2 + np.conj(d) * D.mult_h(x2)
        return jnp.concatenate([y1, y2], axis=0)

    return ShellOperator((m1 + m2, n1 + n2), dtype, matvec, rmatvec, nnz=nnz)


class MatBSE(ShellOperator):
    """Bethe-Salpeter Hamiltonian H = [R C; -C^H -R^T].

    R is Hermitian, C symmetric (complex).  Carries its blocks so the
    structure-preserving EPS BSE variants can exploit them
    (reference: MatCreateBSE src/sys/mat/matstruct.c:45-80; consumed by
    src/eps/impls/krylov/krylovschur/ks-bse.c).
    """

    def __init__(self, R: LinearOperator, C: LinearOperator):
        self.R = R
        self.C = C
        n = R.shape[0]
        dtype = np.result_type(R.dtype, C.dtype)

        def matvec(x):
            x1, x2 = x[:n], x[n:]
            y1 = R.mult(x1) + C.mult(x2)
            # -C^H x1 - R^T x2 = -(C.mult_h(x1)) - conj(R.mult_h(conj(x2)))
            y2 = -C.mult_h(x1) - jnp.conj(R.mult_h(jnp.conj(x2)))
            return jnp.concatenate([y1, y2], axis=0)

        def rmatvec(x):
            x1, x2 = x[:n], x[n:]
            # H^H = [R^H -C; C^H -R^conj]; R Hermitian => R^H = R
            y1 = R.mult_h(x1) - C.mult(x2)
            y2 = C.mult_h(x1) - jnp.conj(R.mult(jnp.conj(x2)))
            return jnp.concatenate([y1, y2], axis=0)

        super().__init__((2 * n, 2 * n), dtype, matvec, rmatvec,
                         nnz=2 * (R.nnz + C.nnz))


def create_bse(R: LinearOperator, C: LinearOperator) -> MatBSE:
    return MatBSE(R, C)
