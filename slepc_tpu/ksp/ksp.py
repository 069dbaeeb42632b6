"""KSP — linear system solves for the inner loops.

The reference delegates every linear solve to PETSc KSP/PC — iterative
Krylov methods or direct factorizations (MUMPS/SuperLU), configured
per-object (reference: src/sys/classes/st/interface/stsles.c STMatSolve ->
KSPSolve; default preonly+LU at stsles.c:35-59).

TPU design: iterative methods (CG / BiCGStab / GMRES) are jit-compiled
XLA programs over our LinearOperator SpMV — the TPU-native inner-solve
path.  Direct factorization lives in ``DirectSolver`` (device dense LU /
device tridiagonal cyclic reduction / host sparse LU), mirroring the
reference's use of per-rank CPU factorization packages.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mat.linop import DiagonalOperator, LinearOperator
from .direct import DirectSolver


def _jacobi_precond(A: LinearOperator):
    """Diagonal (Jacobi) preconditioner closure from operator diagonal."""
    try:
        d = jnp.diagonal(A.to_dense()) if A.shape[0] <= 4096 else None
    except Exception:
        d = None
    if d is None:
        from ..mat.linop import AIJOperator, DIAOperator

        if isinstance(A, DIAOperator):
            i0 = A.offsets.index(0) if 0 in A.offsets else None
            d = A.diags[i0] if i0 is not None else None
        elif isinstance(A, AIJOperator):
            eqs = A.indices == jax.lax.broadcasted_iota(
                jnp.int32, A.indices.shape, 0)
            d = jnp.sum(jnp.where(eqs, A.data, 0), axis=1)
    if d is None:
        return None
    dinv = jnp.where(jnp.abs(d) > 1e-300, 1.0 / d, 1.0)
    return lambda x: dinv * x if x.ndim == 1 else dinv[:, None] * x


class KSP:
    """A configured linear solver for a fixed operator.

    methods: 'cg', 'bicgstab', 'gmres', 'minres' (iterative, device),
             'preonly' (apply preconditioner only — the STPRECOND path),
             'direct' (factorize via DirectSolver: device dense/tridiag or
             host sparse LU).
    """

    def __init__(self, A: LinearOperator, method: str = "auto",
                 pc: str = "jacobi", rtol: float = 1e-10, atol: float = 0.0,
                 maxiter: Optional[int] = None, hermitian: bool = False,
                 direct_backend: str = "auto"):
        self.A = A
        self.rtol = rtol
        self.atol = atol
        self.maxiter = maxiter if maxiter is not None else min(2 * A.shape[0], 10000)
        self.hermitian = hermitian
        if method == "auto":
            method = "direct" if A.shape[0] <= 8192 or _is_directable(A) else (
                "cg" if hermitian else "bicgstab")
        self.method = method
        self._direct: Optional[DirectSolver] = None
        if method == "direct":
            self._direct = DirectSolver(A, backend=direct_backend)
        self._pcname = pc
        self._M = None
        if method in ("cg", "bicgstab", "gmres", "minres", "preonly") and pc == "jacobi":
            self._M = _jacobi_precond(A)

    def solve(self, b, x0=None):
        """Solve A x = b; b may be (n,) or (n, k)."""
        from ..sys.events import log_event

        with log_event(f"KSP_Solve_{self.method}"):
            return self._solve_inner(b, x0)

    def set_nullspace(self, N) -> "KSP":
        """Attach an orthonormal nullspace basis N (n x c): right-hand
        sides and solutions are projected onto range(A) — the reference's
        MatSetNullSpace consumed by KSP (see STCheckNullSpace,
        stsles.c:413-451).  For direct solves the factorization switches
        to the bordered system [[A, N], [N^H, 0]], which is nonsingular
        when N spans the nullspace of the (symmetric-range) A."""
        self._nullspace = jnp.asarray(N) if N is not None else None
        self._bordered = None
        if N is not None and self.method == "direct":
            try:
                import scipy.sparse as sp
                import scipy.sparse.linalg as spla

                As = self.A.to_scipy()
                Nn = np.asarray(N)
                n, c = Nn.shape
                if sp.issparse(As):
                    M = sp.bmat([[As, sp.csc_matrix(Nn)],
                                 [sp.csc_matrix(Nn.conj().T), None]],
                                format="csc")
                    lu = spla.splu(M)
                    self._bordered = ("sparse", lu, n, c)
                else:
                    M = np.block([[np.asarray(As), Nn],
                                  [Nn.conj().T, np.zeros((c, c), As.dtype)]])
                    import scipy.linalg as sla

                    self._bordered = ("dense", sla.lu_factor(M), n, c)
            except Exception:
                self._bordered = None
        return self

    def _project_nullspace(self, v):
        N = getattr(self, "_nullspace", None)
        if N is None:
            return v
        if jnp.ndim(v) == 2:
            return v - N @ (N.conj().T @ v)
        return v - N @ (N.conj().T @ v)

    def _solve_inner(self, b, x0=None):
        b = self._project_nullspace(b)
        bd = getattr(self, "_bordered", None)
        if bd is not None:
            kind, fac, n, c = bd
            bn = np.asarray(b)
            one_d = bn.ndim == 1
            if one_d:
                bn = bn[:, None]
            rhs = np.concatenate([bn, np.zeros((c, bn.shape[1]), bn.dtype)])
            if kind == "sparse":
                xs = fac.solve(rhs)
            else:
                import scipy.linalg as sla

                xs = sla.lu_solve(fac, rhs)
            x = jnp.asarray(xs[:n, 0] if one_d else xs[:n])
            return x
        if self.method == "direct":
            return self._project_nullspace(self._direct.solve(b))
        if self.method == "preonly":
            return self._M(b) if self._M is not None else b
        if jnp.ndim(b) == 2:
            cols = [self._solve_inner(b[:, j], None if x0 is None else x0[:, j])
                    for j in range(b.shape[1])]
            return jnp.stack(cols, axis=1)
        matvec = self.A.mult
        if self.method in ("cg", "minres"):
            x, _ = jax.scipy.sparse.linalg.cg(
                matvec, b, x0=x0, tol=self.rtol, atol=self.atol,
                maxiter=self.maxiter, M=self._M)
        elif self.method == "bicgstab":
            x, _ = jax.scipy.sparse.linalg.bicgstab(
                matvec, b, x0=x0, tol=self.rtol, atol=self.atol,
                maxiter=self.maxiter, M=self._M)
        elif self.method == "gmres":
            x, _ = jax.scipy.sparse.linalg.gmres(
                matvec, b, x0=x0, tol=self.rtol, atol=self.atol,
                maxiter=self.maxiter, M=self._M, restart=min(30, self.A.shape[0]),
                solve_method="batched")
        else:
            raise ValueError(f"unknown KSP method {self.method}")
        return self._project_nullspace(x)

    def inertia(self):
        """(n_negative, n_zero, n_positive) of the symmetric operator —
        the spectrum-slicing primitive (reference: MatGetInertia via
        Cholesky/LDL^T factorization, ks-slice.c:227-258)."""
        if self._direct is None:
            self._direct = DirectSolver(self.A, backend="auto")
        return self._direct.inertia()


def _is_directable(A: LinearOperator) -> bool:
    from ..mat.linop import AIJOperator, DenseOperator, DIAOperator

    return isinstance(A, (DenseOperator, DIAOperator)) or (
        isinstance(A, AIJOperator) and A._scipy is not None)


def solve_linear(A: LinearOperator, b, method: str = "auto", **kw):
    return KSP(A, method=method, **kw).solve(b)
