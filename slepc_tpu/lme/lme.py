"""LME — linear matrix equations with low-rank right-hand sides.

Reference: src/lme/ — A X + X A^T + C = 0 (Lyapunov; also Sylvester /
Stein / gen. Lyapunov enums, include/slepclme.h:52-57) with C = -C1 C1^T
low rank, solved by Krylov projection with compressed factors
(impls/krylov/lmekrylov.c:48-205) and dense Lyapunov kernels
(interface/lmedense.c — here scipy solve_lyapunov/solve_sylvester).

The result is returned factored: X ≈ Z Z^H (Lyapunov) with Z = V L.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from ..bv.bv import BV
from ..bv.krylov import arnoldi_extend
from ..mat.linop import LinearOperator


class LMEProblemType(enum.Enum):
    LYAPUNOV = "lyapunov"  # A X + X A^T + C C^H = 0
    SYLVESTER = "sylvester"  # A X + X B + C = 0
    GEN_LYAPUNOV = "gen_lyapunov"  # A X E^T + E X A^T + C C^H = 0
    STEIN = "stein"  # A X A^T - X + C = 0


class LME:
    """Krylov projection solver for low-rank matrix equations."""

    def __init__(self, A: Optional[LinearOperator] = None, *,
                 B: Optional[LinearOperator] = None,
                 problem_type: str | LMEProblemType = LMEProblemType.LYAPUNOV,
                 ncv: int = 30, tol: Optional[float] = None, max_it: int = 100):
        self.A = A
        self.B = B
        self.problem_type = (LMEProblemType(problem_type)
                             if isinstance(problem_type, str) else problem_type)
        self.ncv = ncv
        self.tol = tol
        self.max_it = max_it
        self.its = 0
        self.errest = np.inf

    def set_coefficients(self, A: LinearOperator, B: Optional[LinearOperator] = None):
        self.A = A
        self.B = B
        return self

    def set_dimensions(self, ncv: int):
        self.ncv = ncv
        return self

    def set_tolerances(self, tol=None, max_it=None):
        if tol is not None:
            self.tol = tol
        if max_it is not None:
            self.max_it = max_it
        return self

    def solve(self, C1: np.ndarray, C2: np.ndarray = None) -> np.ndarray:
        """Solve the configured equation (reference LMESolve).

        LYAPUNOV: A X + X A^H + C1 C1^H = 0 -> returns Z, X ~ Z Z^H.
        GEN_LYAPUNOV: A X E^H + E X A^H + C1 C1^H = 0 (E = self.B) ->
          reduced to standard form with F = E^{-1}A, C~ = E^{-1}C1.
        SYLVESTER: A X + X B + C1 C2^H = 0 -> Krylov-projected two-sided
          solve for large operators (returns (L, R): X ~ L R^H) or the
          dense kernel for small ones.
        STEIN: dense kernel.
        """
        if self.problem_type == LMEProblemType.GEN_LYAPUNOV:
            from ..ksp import KSP
            from ..mat.linop import ShellOperator

            E = self.B
            ksp = KSP(E, method="direct")
            A0 = self.A
            n = A0.shape[0]
            F = ShellOperator((n, n), A0.dtype,
                              lambda x: ksp.solve(A0.mult(x)),
                              host_callback=True)
            C1 = np.atleast_2d(np.asarray(C1))
            if C1.shape[0] != n:
                C1 = C1.T
            Ct = np.column_stack([np.asarray(ksp.solve(jnp.asarray(
                C1[:, j], dtype=A0.dtype))) for j in range(C1.shape[1])])
            sub = LME(F, ncv=self.ncv, tol=self.tol, max_it=self.max_it)
            return sub.solve(Ct)
        if self.problem_type == LMEProblemType.SYLVESTER and self.A.shape[0] > 600:
            return self._solve_sylvester_krylov(C1, C2)
        if self.problem_type == LMEProblemType.STEIN and self.A.shape[0] > 600:
            return self._solve_stein_krylov(C1)
        if self.problem_type != LMEProblemType.LYAPUNOV:
            return self._solve_sylvester_like(C1 if C2 is None else
                                              np.atleast_2d(C1) @ np.atleast_2d(C2).conj().T)
        A = self.A
        n = A.shape[0]
        dtype = np.dtype(A.dtype)
        if self.tol is None:
            self.tol = 1e-8 if dtype.itemsize >= 8 else 1e-5
        C1 = np.atleast_2d(np.asarray(C1))
        if C1.shape[0] != n:
            C1 = C1.T
        r = C1.shape[1]
        m = min(self.ncv, n)
        self.its = 0
        Zs = []
        # X = sum_j X_j with X_j solving against the rank-1 rhs c_j c_j^H
        # (linearity; cross terms of C1 C1^H vanish in the sum)
        for j in range(r):
            cnorm = np.linalg.norm(C1[:, j])
            if cnorm == 0:
                continue
            v0 = C1[:, j] / cnorm
            mm = m
            for attempt in range(4):
                self.its += 1
                V = BV(n, mm + 1, dtype)
                V.set_column(0, jnp.asarray(v0, dtype=dtype))
                H = jnp.zeros((mm + 1, mm), dtype=dtype)
                Varr, H, beta_j, _, _ = arnoldi_extend(A, V.array, H, 0, mm, nc=0)
                Hm = np.asarray(H)[:mm, :mm]
                beta = float(beta_j)
                e1 = np.zeros(mm)
                e1[0] = cnorm
                # projected: Hm Y + Y Hm^T + e1 e1^T = 0
                Y = sla.solve_lyapunov(Hm, -np.outer(e1, e1))
                # residual estimate: || beta * e_m^T Y || * 2
                res = 2.0 * beta * np.linalg.norm(Y[-1, :])
                self.errest = res / max(np.linalg.norm(Y), 1e-300)
                if self.errest < self.tol or mm >= n:
                    break
                mm = min(2 * mm, n)
            # factor Y = L L^H (symmetrize, clip negative eigenvalues)
            w, P = np.linalg.eigh(0.5 * (Y + Y.T))
            w = np.maximum(w, 0.0)
            L = P * np.sqrt(w)[None, :]
            keep = np.sqrt(w) > 1e-14 * max(np.sqrt(w).max(), 1e-300)
            L = L[:, keep]
            Zj = np.asarray(Varr[:, :mm]) @ L
            Zs.append(Zj)
        Z = np.concatenate(Zs, axis=1) if Zs else np.zeros((n, 0))
        return Z

    def _solve_sylvester_krylov(self, C1: np.ndarray, C2: np.ndarray):
        """Two-sided Krylov projection for large Sylvester equations with
        low-rank rhs C = C1 C2^H (reference lmekrylov.c:48-199 strategy
        applied two-sided): per rank-1 term c1 c2^H build V = K_m(A, c1),
        W = K_m(B^H, c2), solve the projected Sylvester
        HA Y + Y HB^H + ||c1|| ||c2|| e1 e1^T = 0, and stop on the EXACT
        factored residual
           R = betaA v_{m+1} (e_m^T Y) W^H + (V Y e_m) betaB w_{m+1}^H
           ||R||_F = sqrt(betaA^2 ||Y[m-1,:]||^2 + betaB^2 ||Y[:,m-1]||^2)
        (both Arnoldi relations exact, the rhs lies in the bases); the
        basis doubles until the relative residual meets tol.
        Returns (L, R): X ~ L R^H."""
        import scipy.linalg as sla

        from ..bv.bv import BV
        from ..bv.krylov import extend_dispatch
        from ..mat.linop import AdjointOperator

        A, Bop = self.A, self.B
        n, m2 = A.shape[0], Bop.shape[0]
        dtype = np.dtype(A.dtype)
        if self.tol is None:
            self.tol = 1e-8 if np.dtype(dtype).itemsize >= 8 else 1e-5
        C1 = np.atleast_2d(np.asarray(C1))
        C2 = np.atleast_2d(np.asarray(C2))
        if C1.shape[0] != n:
            C1 = C1.T
        if C2.shape[0] != m2:
            C2 = C2.T
        self.its = 0
        Ls, Rs = [], []
        for j in range(min(C1.shape[1], C2.shape[1])):
            n1 = np.linalg.norm(C1[:, j])
            n2 = np.linalg.norm(C2[:, j])
            if n1 == 0 or n2 == 0:
                continue
            mdim = min(self.ncv, n, m2)
            while True:
                self.its += 1
                Vb = BV(n, mdim + 1, dtype)
                Vb.set_column(0, jnp.asarray(C1[:, j] / n1, dtype=dtype))
                Wb = BV(m2, mdim + 1, dtype)
                Wb.set_column(0, jnp.asarray(C2[:, j] / n2, dtype=dtype))
                HA = jnp.zeros((mdim + 1, mdim), dtype=dtype)
                HB = jnp.zeros((mdim + 1, mdim), dtype=dtype)
                Varr, HA, bA, _, _ = extend_dispatch(A, Vb.array, HA, 0, mdim)
                Warr, HB, bB, _, _ = extend_dispatch(
                    AdjointOperator(Bop), Wb.array, HB, 0, mdim)
                Ap = np.asarray(HA)[:mdim, :mdim]
                Bp = np.asarray(HB)[:mdim, :mdim].conj().T  # W^H B W
                Cp = np.zeros((mdim, mdim), dtype=np.asarray(Ap).dtype)
                Cp[0, 0] = n1 * n2
                Y = sla.solve_sylvester(Ap, Bp, -Cp)
                res = np.hypot(float(bA) * np.linalg.norm(Y[-1, :]),
                               float(bB) * np.linalg.norm(Y[:, -1]))
                self.errest = res / max(n1 * n2, 1e-300)
                if (self.errest < self.tol or mdim >= min(n, m2)
                        or self.its >= self.max_it):
                    break
                mdim = min(2 * mdim, min(n, m2))
            Ls.append(np.asarray(Varr[:, :mdim]) @ Y)
            Rs.append(np.asarray(Warr[:, :mdim]))
        if not Ls:
            return np.zeros((n, 0)), np.zeros((m2, 0))
        return np.concatenate(Ls, axis=1), np.concatenate(Rs, axis=1)

    def _solve_stein_krylov(self, C1: np.ndarray):
        """Krylov projection for large Stein equations
        A X A^H - X + C1 C1^H = 0 (reference slepclme.h LME_STEIN; same
        lmekrylov.c projection pattern): per rhs column, V = K_m(A, c),
        projected discrete Lyapunov Hm Y Hm^H - Y + c c^T = 0, residual
        from the Arnoldi cross terms
          ||R|| <= 2 beta ||Hm Y e_m|| + beta^2 |Y[m-1,m-1]|.
        Returns Z with X ~ Z Z^H (C1 C1^H rhs keeps X PSD)."""
        import scipy.linalg as sla

        from ..bv.bv import BV
        from ..bv.krylov import extend_dispatch

        A = self.A
        n = A.shape[0]
        dtype = np.dtype(A.dtype)
        if self.tol is None:
            self.tol = 1e-8 if np.dtype(dtype).itemsize >= 8 else 1e-5
        C1 = np.atleast_2d(np.asarray(C1))
        if C1.shape[0] != n:
            C1 = C1.T
        self.its = 0
        Zs = []
        for j in range(C1.shape[1]):
            cn = np.linalg.norm(C1[:, j])
            if cn == 0:
                continue
            mdim = min(self.ncv, n)
            while True:
                self.its += 1
                Vb = BV(n, mdim + 1, dtype)
                Vb.set_column(0, jnp.asarray(C1[:, j] / cn, dtype=dtype))
                H = jnp.zeros((mdim + 1, mdim), dtype=dtype)
                Varr, H, beta, _, _ = extend_dispatch(A, Vb.array, H, 0, mdim)
                Hm = np.asarray(H)[:mdim, :mdim]
                E = np.zeros((mdim, mdim))
                E[0, 0] = cn * cn
                Y = sla.solve_discrete_lyapunov(Hm, E)
                b = float(beta)
                res = (2.0 * b * np.linalg.norm(Hm @ Y[:, -1])
                       + b * b * abs(Y[-1, -1]))
                self.errest = res / max(cn * cn, 1e-300)
                if (self.errest < self.tol or mdim >= n
                        or self.its >= self.max_it):
                    break
                mdim = min(2 * mdim, n)
            w, P = np.linalg.eigh(0.5 * (Y + Y.conj().T))
            w = np.maximum(w, 0.0)
            keep = np.sqrt(w) > 1e-14 * max(np.sqrt(w).max(), 1e-300)
            L = (P * np.sqrt(w)[None, :])[:, keep]
            Zs.append(np.asarray(Varr[:, :mdim]) @ L)
        return np.concatenate(Zs, axis=1) if Zs else np.zeros((n, 0))

    def _solve_sylvester_like(self, C: np.ndarray) -> np.ndarray:
        """Dense fallback for Sylvester/Stein (small n) — the dense kernels
        tier (reference interface/lmedense.c)."""
        A = np.asarray(self.A.to_dense())
        C = np.asarray(C)
        if self.problem_type == LMEProblemType.SYLVESTER:
            B = np.asarray(self.B.to_dense())
            return sla.solve_sylvester(A, B, -C)
        if self.problem_type == LMEProblemType.STEIN:
            # A X A^T - X + C = 0  -> discrete Lyapunov
            return sla.solve_discrete_lyapunov(A, C)
        raise ValueError(self.problem_type)

    def compute_residual(self, Z: np.ndarray, C1: np.ndarray) -> float:
        """||A X + X A^H + C1 C1^H||_F / ||C1 C1^H||_F with X = Z Z^H."""
        Zj = jnp.asarray(Z)
        AZ = np.asarray(self.A.mult(Zj))
        X = Z @ Z.conj().T
        R = AZ @ Z.conj().T
        R = R + R.conj().T
        C1 = np.atleast_2d(np.asarray(C1))
        if C1.shape[0] != X.shape[0]:
            C1 = C1.T
        R = R + C1 @ C1.conj().T
        return float(np.linalg.norm(R) / max(np.linalg.norm(C1 @ C1.conj().T), 1e-300))
