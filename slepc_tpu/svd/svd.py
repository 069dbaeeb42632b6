"""SVD — singular value decomposition solvers.

Reference: src/svd/ — solvers cross (EPS on A^H A, impls/cross/cross.c),
cyclic (EPS on H = [0 A; A^H 0], impls/cyclic/cyclic.c), lanczos
(explicit-restart Golub–Kahan), trlanczos (thick-restart GK
bidiagonalization, impls/trlanczos/trlanczos.c), randomized (HMT RSVD,
impls/randomized/rsvd.c), plus GSVD/HSVD variants.

TPU design: cross/cyclic are closures over the operator algebra feeding
the EPS engine (a shell operator is literally a function here); trlanczos
runs the jitted Lanczos kernel with the bidiagonal harvested on host;
randomized is two dense GEMMs + a QR/SVD, ideal for the MXU.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bv.bv import BV
from ..eps.base import EPS, ProblemType
from ..mat.linop import LinearOperator, ShellOperator
from ..sys.sort import Which


class SVDWhich(enum.Enum):
    LARGEST = "largest"
    SMALLEST = "smallest"


class SVD:
    """Partial SVD: A ≈ U diag(sigma) V^H."""

    def __init__(self, A: Optional[LinearOperator] = None, *,
                 nsv: int = 1, ncv: Optional[int] = None,
                 which: str | SVDWhich = SVDWhich.LARGEST,
                 tol: Optional[float] = None, max_it: Optional[int] = None,
                 solver: str = "trlanczos", B: Optional[LinearOperator] = None,
                 omega: Optional[np.ndarray] = None):
        self.A = A
        self.B = B  # GSVD second matrix
        self.omega = omega  # HSVD signature
        self.nsv = nsv
        self.ncv = ncv
        self.which = SVDWhich(which) if isinstance(which, str) else which
        self.tol = tol
        self.max_it = max_it
        self.solver = solver
        self.nconv = 0
        self.its = 0
        self.sigma = np.array([])
        self.U: Optional[np.ndarray] = None
        self.V: Optional[np.ndarray] = None
        from ..sys.options import apply_module_options

        apply_module_options(self, "svd_", int_keys=("nsv", "ncv", "max_it"),
                             float_keys=("tol",), str_keys=("type",))

    def set_operator(self, A, B=None):
        self.A = A
        self.B = B
        return self

    def set_dimensions(self, nsv=None, ncv=None):
        if nsv is not None:
            self.nsv = nsv
        if ncv is not None:
            self.ncv = ncv
        return self

    def set_which(self, which):
        self.which = SVDWhich(which) if isinstance(which, str) else which
        return self

    def set_type(self, name: str):
        self.solver = name
        return self

    def set_tolerances(self, tol=None, max_it=None):
        if tol is not None:
            self.tol = tol
        if max_it is not None:
            self.max_it = max_it
        return self

    def solve(self):
        if self.B is not None:
            if self.solver in ("trlanczos", "lanczos"):
                from .trlanczos import gsvd_jbd_solve

                gsvd_jbd_solve(self)
            else:
                self._solve_gsvd()
        elif self.omega is not None:
            self._solve_hsvd()
        elif self.solver == "cross":
            self._solve_cross()
        elif self.solver == "cyclic":
            self._solve_cyclic()
        elif self.solver in ("trlanczos", "lanczos"):
            self._solve_trlanczos()
        elif self.solver == "randomized":
            self._solve_randomized()
        elif self.solver == "lapack":
            self._solve_lapack()
        else:
            raise ValueError(f"unknown SVD solver {self.solver!r}")
        return self

    def _solve_gsvd(self):
        """Generalized SVD of (A, B): sigma = generalized singular values of
        the pencil (A^H A, B^H B) — solved matrix-free through the EPS GHEP
        engine on shell cross operators (the reference's trlanczos GSVD,
        trlanczos.c:59-65, runs a joint bidiagonalization of Z=[A;B]; the
        cross formulation here computes the same triplets)."""
        A, B = self.A, self.B
        n = A.shape[1]

        def mvA(x):
            return A.mult_h(A.mult(x))

        def mvB(x):
            return B.mult_h(B.mult(x))

        opA = ShellOperator((n, n), A.dtype, mvA, mvA, nnz=2 * A.nnz)
        opB = ShellOperator((n, n), B.dtype, mvB, mvB, nnz=2 * B.nnz)
        which = (Which.LARGEST_REAL if self.which == SVDWhich.LARGEST
                 else Which.SMALLEST_MAGNITUDE)
        eps = EPS(opA, opB, problem_type=ProblemType.GHEP, which=which,
                  nev=self.nsv, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
        eps.solve()
        self.its = eps.its
        k = self.nconv = eps.nconv
        lam = np.maximum(np.real(eps.eigenvalues[:k]), 0.0)
        self.sigma = np.sqrt(lam)  # sigma = c/s (A-part over B-part)
        X = np.array(eps.get_eigenvectors(), copy=True)
        if np.iscomplexobj(X) and not np.issubdtype(np.dtype(A.dtype),
                                                    np.complexfloating):
            X = X.real
        Xj = jnp.asarray(X, dtype=A.dtype)
        U = np.array(A.mult(Xj), copy=True)
        V = np.array(B.mult(Xj), copy=True)
        for M in (U, V):
            nrm = np.linalg.norm(M, axis=0)
            nrm[nrm == 0] = 1
            M /= nrm
        self.U, self.V = U, V
        self.X = X  # right generalized singular vectors (non-orthogonal)

    def _solve_hsvd(self):
        """Hyperbolic SVD: A = U Sigma V^H with U^H Omega U = Omega-hat
        (reference: trlanczos.c HSVD variant :553-592).  Via the
        Omega-weighted cross operator A^H Omega A (Hermitian indefinite)."""
        A = self.A
        m, n = A.shape
        om = jnp.asarray(np.asarray(self.omega, dtype=float))

        def mv(x):
            return A.mult_h(om[:, None] * A.mult(x) if x.ndim == 2
                            else om * A.mult(x))

        op = ShellOperator((n, n), A.dtype, mv, mv, nnz=2 * A.nnz)
        which = (Which.LARGEST_MAGNITUDE if self.which == SVDWhich.LARGEST
                 else Which.SMALLEST_MAGNITUDE)
        eps = EPS(op, problem_type=ProblemType.HEP, which=which,
                  nev=self.nsv, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
        eps.solve()
        self.its = eps.its
        k = self.nconv = eps.nconv
        lam = np.real(eps.eigenvalues[:k])
        self.sigma = np.sqrt(np.abs(lam))
        self.sign = np.where(lam >= 0, 1.0, -1.0)  # signature Omega-hat
        V = np.asarray(eps.get_eigenvectors())
        self.V = V
        AV = np.asarray(A.mult(jnp.asarray(V, dtype=A.dtype)))
        denom = np.where(self.sigma > 1e-300, self.sign * self.sigma, 1.0)
        self.U = AV / denom

    # -- results ----------------------------------------------------------
    def get_converged(self):
        return self.nconv

    def get_singular_triplet(self, i: int):
        return self.sigma[i], self.U[:, i], self.V[:, i]

    def compute_error(self, i: int) -> float:
        s, u, v = self.get_singular_triplet(i)
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        r1 = self.A.mult(v) - s * u
        r2 = self.A.mult_h(u) - s * v
        num = float(jnp.sqrt(jnp.linalg.norm(r1) ** 2 + jnp.linalg.norm(r2) ** 2))
        return num / max(float(s), 1e-300)

    # -- solvers ----------------------------------------------------------
    def _eps_which(self):
        return Which.LARGEST_REAL if self.which == SVDWhich.LARGEST else Which.SMALLEST_MAGNITUDE

    def _solve_cross(self):
        """EPS on the cross-product operator A^H A (reference cross.c:255;
        the shell Mat there is a closure here)."""
        A = self.A
        m, n = A.shape
        use_ata = n <= m
        dim = n if use_ata else m

        def mv(x):
            return A.mult_h(A.mult(x)) if use_ata else A.mult(A.mult_h(x))

        op = ShellOperator((dim, dim), A.dtype, mv, mv, nnz=2 * A.nnz)
        eps = EPS(op, problem_type=ProblemType.HEP, which=self._eps_which(),
                  nev=self.nsv, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
        eps.solve()
        self.its = eps.its
        self.nconv = eps.nconv
        k = eps.nconv
        lam = np.maximum(np.real(eps.eigenvalues[:k]), 0.0)
        self.sigma = np.sqrt(lam)
        X = eps.get_eigenvectors().real if not np.iscomplexobj(
            np.zeros(1, A.dtype)) else eps.get_eigenvectors()
        Xj = jnp.asarray(X, dtype=A.dtype)
        if use_ata:
            self.V = np.asarray(X)
            AV = np.asarray(A.mult(Xj))
            U = AV / np.where(self.sigma > 1e-300, self.sigma, 1.0)
            self.U = U
        else:
            self.U = np.asarray(X)
            AU = np.asarray(A.mult_h(Xj))
            self.V = AU / np.where(self.sigma > 1e-300, self.sigma, 1.0)
        self._renormalize()

    def _solve_cyclic(self):
        """EPS on H = [0 A; A^H 0] (reference cyclic.c; eigenvalues ±sigma,
        eigenvectors (u; v)/sqrt2)."""
        A = self.A
        m, n = A.shape

        def mv(x):
            x1, x2 = x[:m], x[m:]
            return jnp.concatenate([A.mult(x2), A.mult_h(x1)], axis=0)

        op = ShellOperator((m + n, m + n), A.dtype, mv, mv, nnz=2 * A.nnz)
        which = Which.LARGEST_REAL if self.which == SVDWhich.LARGEST else Which.SMALLEST_MAGNITUDE
        eps = EPS(op, problem_type=ProblemType.HEP, which=which,
                  nev=self.nsv, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
        eps.solve()
        self.its = eps.its
        lam = np.real(eps.eigenvalues[: eps.nconv])
        X = np.asarray(eps.get_eigenvectors())
        pos = lam > 0
        lam, X = lam[pos], X[:, pos]
        order = np.argsort(-lam) if self.which == SVDWhich.LARGEST else np.argsort(lam)
        lam, X = lam[order], X[:, order]
        k = min(self.nsv, len(lam))
        self.nconv = k
        self.sigma = lam[:k]
        self.U = X[:m, :k] * np.sqrt(2.0)
        self.V = X[m:, :k] * np.sqrt(2.0)
        self._renormalize()

    def _solve_trlanczos(self):
        """Thick-restart Golub–Kahan–Lanczos bidiagonalization
        (reference trlanczos.c).  Round-1 implementation runs the cross
        engine with GK-grade accuracy via one refinement of U; a native
        two-sided GK loop replaces this in a later milestone."""
        from .trlanczos import trlanczos_solve

        trlanczos_solve(self)

    def _solve_randomized(self):
        """Halko–Martinsson–Tropp randomized SVD (reference rsvd.c:159) —
        pure GEMMs: ideal MXU utilization."""
        A = self.A
        m, n = A.shape
        k = self.nsv
        p = min(2 * k + 10, min(m, n))
        rng = np.random.default_rng(0)
        Om = jnp.asarray(rng.standard_normal((n, p)), dtype=A.dtype)
        Y = A.mult(Om)
        for _ in range(2):  # power iterations for accuracy
            Q, _ = jnp.linalg.qr(Y)
            Y = A.mult(A.mult_h(Q))
        Q, _ = jnp.linalg.qr(Y)
        Bsmall = np.asarray(A.mult_h(Q)).conj().T  # (p, n)
        Ub, s, Vh = np.linalg.svd(Bsmall, full_matrices=False)
        U = np.asarray(Q) @ Ub
        self.nconv = k
        self.its = 1
        self.sigma = s[:k]
        self.U = U[:, :k]
        self.V = Vh[:k, :].conj().T
        self._renormalize()

    def _solve_lapack(self):
        A = np.asarray(self.A.to_dense())
        U, s, Vh = np.linalg.svd(A, full_matrices=False)
        if self.which == SVDWhich.SMALLEST:
            U, s, Vh = U[:, ::-1], s[::-1], Vh[::-1, :]
        k = min(self.nsv, len(s))
        self.nconv = k
        self.its = 1
        self.sigma = s[:k]
        self.U, self.V = U[:, :k], Vh[:k, :].conj().T

    def _renormalize(self):
        if self.U is not None and self.U.size:
            self.U = np.array(self.U, copy=True)
            self.V = np.array(self.V, copy=True)
            for M in (self.U, self.V):
                nrm = np.linalg.norm(M, axis=0)
                nrm[nrm == 0] = 1
                M /= nrm
