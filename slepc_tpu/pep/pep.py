"""PEP — polynomial eigenvalue problems P(lambda) x = 0.

Reference: src/pep/ — P(lambda) = sum_i phi_i(lambda) A_i over
monomial/Chebyshev/... bases with scaling, extraction and refinement.
Solvers: toar (default; two-level orthogonal Arnoldi on the companion
linearization with the basis held compactly in a tensor BV, ptoar.c),
stoar, qarnoldi, linear (explicit linearization -> inner EPS, linear.c),
jd, ciss.

Here: 'linear' builds the companion pencil as composable shell operators
(no assembly) and delegates to the EPS engine; 'toar' is the native
compact-representation solver in toar.py; 'qarnoldi' shares toar's
machinery.  Scaling (sfactor) follows pepimpl.h:17-19 (scalar scaling).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..eps.base import EPS, ProblemType
from ..ksp import KSP
from ..mat.linop import IdentityOperator, LinearOperator, ShellOperator
from ..sys.sort import SortCriterion, Which


class PEP:
    """Polynomial eigensolver: (sum_i lambda^i A_i) x = 0."""

    def __init__(self, mats: Optional[Sequence[LinearOperator]] = None, *,
                 nev: int = 1, ncv: Optional[int] = None,
                 which: str | Which = Which.LARGEST_MAGNITUDE,
                 target: Optional[complex] = None,
                 tol: Optional[float] = None, max_it: Optional[int] = None,
                 solver: str = "toar", basis: str = "monomial",
                 scale: str = "none"):
        self.mats: List[LinearOperator] = list(mats) if mats else []
        self.nev = nev
        self.ncv = ncv
        self.which = Which(which) if isinstance(which, str) else which
        self.target = target
        self.tol = tol
        self.max_it = max_it
        self.solver = solver
        self.basis = basis
        self.scale = scale
        self.sfactor = 1.0
        self.nconv = 0
        self.its = 0
        self.eigenvalues = np.array([])
        self.errests = np.array([])
        self._eigenvectors: Optional[np.ndarray] = None

    def set_operators(self, mats: Sequence[LinearOperator]):
        self.mats = list(mats)
        return self

    def set_type(self, name: str):
        self.solver = name
        return self

    def set_target(self, t: complex):
        self.target = t
        self.which = Which.TARGET_MAGNITUDE
        return self

    def set_dimensions(self, nev=None, ncv=None):
        if nev is not None:
            self.nev = nev
        if ncv is not None:
            self.ncv = ncv
        return self

    def set_tolerances(self, tol=None, max_it=None):
        if tol is not None:
            self.tol = tol
        if max_it is not None:
            self.max_it = max_it
        return self

    @property
    def degree(self) -> int:
        return len(self.mats) - 1

    @property
    def n(self) -> int:
        return self.mats[0].shape[0]

    def compute_scale(self) -> float:
        """Scalar scaling: sfactor = (||A_0|| / ||A_d||)^(1/d)
        (reference: PEPComputeScaleFactor)."""
        if self.scale != "scalar":
            return 1.0
        from ..mat.linop import DenseOperator

        def nrm(op):
            try:
                return float(np.linalg.norm(np.asarray(op.to_dense()), np.inf)) \
                    if op.shape[0] <= 4096 else 1.0
            except Exception:
                return 1.0

        n0, nd = nrm(self.mats[0]), nrm(self.mats[-1])
        d = self.degree
        if n0 > 0 and nd > 0:
            return (n0 / nd) ** (1.0 / d)
        return 1.0

    def solve(self):
        if self.solver == "linear":
            self._solve_linear()
        elif self.solver in ("toar", "qarnoldi", "stoar"):
            from .toar import toar_solve

            toar_solve(self)
        else:
            raise ValueError(f"unknown PEP solver {self.solver!r}")
        return self

    # ---- linear: companion pencil -> EPS (reference impls/linear/linear.c)
    def _solve_linear(self):
        mats = self.mats
        d = self.degree
        n = self.n
        dtype = mats[0].dtype
        Nn = d * n

        def mvA(x):
            # L0 x: blocks [x_1, ..., x_{d-1}, -sum A_i x_i]
            xs = [x[i * n: (i + 1) * n] for i in range(d)]
            out = [xs[i + 1] for i in range(d - 1)]
            last = -mats[0].mult(xs[0])
            for i in range(1, d):
                last = last - mats[i].mult(xs[i])
            out.append(last)
            return jnp.concatenate(out, axis=0)

        def mvB(x):
            xs = [x[i * n: (i + 1) * n] for i in range(d)]
            out = xs[: d - 1] + [mats[d].mult(xs[d - 1])]
            return jnp.concatenate(out, axis=0)

        L0 = ShellOperator((Nn, Nn), dtype, mvA, nnz=sum(m.nnz for m in mats))
        L1 = ShellOperator((Nn, Nn), dtype, mvB, nnz=mats[d].nnz + (d - 1) * n)

        target = self.target if self.target is not None else 0.0
        eps = EPS(L0, L1, problem_type=ProblemType.GNHEP, which=self.which,
                  nev=self.nev, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
        if self.which in (Which.TARGET_MAGNITUDE, Which.TARGET_REAL,
                          Which.TARGET_IMAGINARY) or self.target is not None:
            eps.set_target(target)
            # sinvert on the pencil: (L0 - sigma L1)^{-1} L1 — needs an
            # explicit solve; build it from the polynomial structure:
            # (L0 - sigma L1) block solve reduces to P(sigma) solves
            eps.set_st(_CompanionSinvert([L0, L1], self, sigma=target))
        eps.solve()
        self.its = eps.its
        self.nconv = eps.nconv
        self.eigenvalues = eps.eigenvalues.copy()
        self.errests = eps.errests.copy()
        X = eps.get_eigenvectors()
        Xp = X[:n, :]
        nrm = np.linalg.norm(Xp, axis=0)
        nrm[nrm == 0] = 1
        self._eigenvectors = Xp / nrm

    # ---- results --------------------------------------------------------
    def get_converged(self):
        return self.nconv

    def get_eigenpair(self, i: int):
        return self.eigenvalues[i], self._eigenvectors[:, i]

    def p_apply(self, lam: complex, x):
        """P(lam) x."""
        y = None
        mu = 1.0
        for A in self.mats:
            t = A.mult(x) * mu
            y = t if y is None else y + t
            mu = mu * lam
        return y

    def compute_error(self, i: int) -> float:
        lam, x = self.get_eigenpair(i)
        xj = jnp.asarray(x)
        r = self.p_apply(complex(lam), xj)
        den = sum(abs(lam) ** k for k in range(self.degree + 1))
        return float(jnp.linalg.norm(r)) / max(den * float(jnp.linalg.norm(xj)), 1e-300)


from ..st.st import ST


class _CompanionSinvert(ST):
    """Shift-and-invert on the companion pencil exploiting the block
    structure: solving (L0 - sigma L1) z = w reduces to one P(sigma) solve
    plus back-substitution through the companion blocks (the reference's
    PEP linear + ST factors P(sigma) the same way via STCoeffs)."""

    name = "companion-sinvert"

    def __init__(self, matrices, pep: PEP, sigma: complex = 0.0):
        super().__init__(matrices, sigma)
        self.pep = pep

    def _compute_operator(self):
        pep = self.pep
        d = pep.degree
        n = pep.n
        sigma = self.sigma
        dtype = pep.mats[0].dtype
        Nn = d * n
        # P(sigma) = sum sigma^i A_i
        from ..mat.linop import SumOperator

        coeffs = [sigma**i for i in range(d + 1)]
        Psig = SumOperator(tuple(pep.mats), tuple(coeffs))
        import scipy.sparse as sp

        try:
            Ps = None
            mats_sc = [m.to_scipy() for m in pep.mats]
            Ps = sum(c * (M if sp.issparse(M) else np.asarray(M))
                     for c, M in zip(coeffs, mats_sc))
            from ..mat.linop import AIJOperator, DenseOperator

            Pop = AIJOperator.from_scipy(sp.csr_matrix(Ps)) if sp.issparse(Ps) \
                else DenseOperator(Ps)
            ksp = KSP(Pop, method="direct")
        except Exception:
            ksp = KSP(Psig, method="bicgstab")
        self.ksp = ksp
        mats = pep.mats
        L1 = self.mats[1]

        def mv(x):
            # solve (L0 - sigma L1) z = L1 x  (the sinvert operator)
            w = L1.mult(x)
            ws = [w[i * n: (i + 1) * n] for i in range(d)]
            # block elimination: z_{i+1} = w_i + sigma z_i (companion rows),
            # last row: -sum A_i z_i - sigma A_d z_{d-1}... solve for z_0:
            # substituting z_i = sigma^i z_0 + t_i with t_0 = 0,
            # t_{i+1} = w_i + sigma t_i gives
            # P(sigma) z_0 = -(w_{d-1}' ) where rhs accumulates A_i t_i
            ts = [jnp.zeros_like(ws[0])]
            for i in range(d - 1):
                ts.append(ws[i] + sigma * ts[i])
            rhs = -ws[d - 1]
            for i in range(1, d):
                rhs = rhs - mats[i].mult(ts[i])
            rhs = rhs - sigma * mats[d].mult(ts[d - 1])
            z0 = ksp.solve(rhs)
            zs = [z0]
            for i in range(d - 1):
                zs.append(sigma * zs[i] + ws[i])
            return jnp.concatenate(zs, axis=0)

        return ShellOperator((Nn, Nn), dtype, mv, nnz=sum(m.nnz for m in mats))

    def back_transform(self, eigs):
        return 1.0 / eigs + self.sigma

    def eig_map(self, lam):
        return 1.0 / (lam - self.sigma)
