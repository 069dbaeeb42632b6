"""MFN — action of a matrix function: y = f(A) b.

Reference: src/mfn/ — MFNSolve (interface/mfnsolve.c:81) with solvers
'krylov' (restarted Arnoldi with the Eiermann–Ernst accumulated-Hessenberg
restart, impls/krylov/mfnkrylov.c:42-127) and 'expokit' (phi-padded
exponential action).  Here 'krylov' is the default; 'expokit' maps to the
same engine with FNExp + adaptive restart length.

Per restart: a jitted Arnoldi extension (SpMVs + fused orthogonalization)
on device; f evaluated on the small accumulated Hessenberg on host (DS/FN
tier); solution update is one device GEMV.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bv.bv import BV
from ..bv.krylov import arnoldi_extend
from ..fn.fn import FN, FNExp
from ..mat.linop import LinearOperator


class MFNConvergedReason:
    CONVERGED_TOL = 1
    CONVERGED_ITS = 2
    DIVERGED_ITS = -1
    ITERATING = 0


class MFN:
    """y = f(A) b via restarted Krylov approximation."""

    def __init__(self, A: Optional[LinearOperator] = None, fn: Optional[FN] = None,
                 ncv: int = 30, tol: Optional[float] = None, max_it: int = 100,
                 solver: str = "krylov"):
        """solver: 'krylov' (Eiermann-Ernst restarts; any FN) or 'expokit'
        (exp-specialized: adaptive Krylov dimension via the phi-function
        error estimate — reference impls/expokit/mfnexpokit.c)."""
        self.A = A
        self.fn = fn if fn is not None else FNExp()
        self.ncv = ncv
        self.tol = tol
        self.max_it = max_it
        self.solver = solver
        self.its = 0
        self.reason = MFNConvergedReason.ITERATING
        from ..sys.options import apply_module_options

        apply_module_options(self, "mfn_", int_keys=("ncv", "max_it"),
                             float_keys=("tol",), str_keys=("type",))

    def set_operator(self, A: LinearOperator):
        self.A = A
        return self

    def set_fn(self, fn: FN):
        self.fn = fn
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

    def solve(self, b, x=None) -> jnp.ndarray:
        """Compute y = f(A) b (reference MFNSolve semantics: restarted
        Arnoldi, convergence when the restart update norm falls below tol
        — the Eiermann–Ernst criterion, mfnkrylov.c:110)."""
        if self.solver == "expokit":
            return self._solve_expokit(b)
        return self._solve_krylov(b)

    def _solve_expokit(self, b) -> jnp.ndarray:
        """Exp-specialized time-stepping (reference mfnexpokit.c / EXPOKIT
        dgexpv): y = beta * exp(alpha A) b via adaptive substeps
        y <- exp(tau A) y, each a fixed-dimension Krylov approximation with
        the phi-augmented Hessenberg supplying the local error estimate."""
        from ..fn.fn import FNExp

        if not isinstance(self.fn, FNExp):
            return self._solve_krylov(b)
        import scipy.linalg as sla

        A = self.A
        n = A.shape[0]
        dtype = np.dtype(A.dtype)
        if self.tol is None:
            self.tol = 1e-8 if dtype.itemsize >= 8 else 1e-5
        m = min(self.ncv, n, 30)
        T = self.fn.alpha  # total "time" (inner scale)
        outer = self.fn.beta
        y = jnp.asarray(b, dtype=dtype)
        t_done = 0.0
        tau = T  # try one step first; adapt down on error
        self.its = 0
        self.reason = MFNConvergedReason.ITERATING
        from ..sys.options import apply_module_options

        apply_module_options(self, "mfn_", int_keys=("ncv", "max_it"),
                             float_keys=("tol",), str_keys=("type",))
        while t_done < abs(T) * (1 - 1e-14):
            self.its += 1
            if self.its > self.max_it:
                self.reason = MFNConvergedReason.DIVERGED_ITS
                break
            beta0 = float(jnp.linalg.norm(y))
            if beta0 == 0:
                break
            V = BV(n, m + 1, dtype)
            V.set_column(0, y / beta0)
            H = jnp.zeros((m + 1, m), dtype=dtype)
            Varr, H, hbeta, brk, _ = arnoldi_extend(A, V.array, H, 0, m, nc=0)
            Hm = np.asarray(H)[:m, :m]
            hb = float(hbeta)
            frac = (abs(T) - t_done) / abs(T)
            sgn = 1.0 if (np.isreal(T) and T >= 0) else (T / abs(T))
            while True:
                # phi-augmented: Hbar = [[tau H, e1],[0, 0]] (size m+1)
                Hbar = np.zeros((m + 1, m + 1), dtype=complex if np.iscomplexobj(Hm) else float)
                Hbar[:m, :m] = (sgn * tau) * Hm
                Hbar[0, m] = 1.0
                F = sla.expm(Hbar)
                w = F[:m, 0]
                err_loc = abs(beta0 * hb * tau * F[m - 1, m])
                if err_loc <= self.tol * max(beta0, 1e-300) * max(tau / abs(T), 1e-14) \
                        or tau < 1e-12 * abs(T):
                    break
                tau *= 0.5
            y = beta0 * (Varr[:, :m] @ jnp.asarray(w, dtype=dtype))
            t_done += tau
            tau = min(2 * tau, abs(T) - t_done) if abs(T) - t_done > 0 else tau
            if abs(T) - t_done <= 1e-14 * abs(T):
                self.reason = MFNConvergedReason.CONVERGED_TOL
                break
            if bool(brk):
                self.reason = MFNConvergedReason.CONVERGED_TOL
                break
        return outer * y

    def _solve_krylov(self, b) -> jnp.ndarray:
        A = self.A
        n = A.shape[0]
        dtype = np.dtype(A.dtype)
        if self.tol is None:
            self.tol = 1e-8 if dtype.itemsize >= 8 else 1e-5
        m = min(self.ncv, n)
        b = jnp.asarray(b, dtype=dtype)
        beta0 = float(jnp.linalg.norm(b))
        if beta0 == 0.0:
            self.reason = MFNConvergedReason.CONVERGED_TOL
            return jnp.zeros_like(b)
        v = b / beta0
        x_acc = jnp.zeros(n, dtype=dtype)
        Htot = np.zeros((0, 0), dtype=complex if np.issubdtype(dtype, np.complexfloating) else float)
        beta_prev = 0.0
        self.its = 0
        self.reason = MFNConvergedReason.ITERATING
        from ..sys.options import apply_module_options

        apply_module_options(self, "mfn_", int_keys=("ncv", "max_it"),
                             float_keys=("tol",), str_keys=("type",))

        for restart in range(self.max_it):
            self.its += 1
            V = BV(n, m + 1, dtype)
            V.set_column(0, v)
            H = jnp.zeros((m + 1, m), dtype=dtype)
            Varr, H, beta_j, brk, _ = arnoldi_extend(A, V.array, H, 0, m, nc=0)
            beta = float(beta_j)
            Hm = np.asarray(H)[:m, :m]

            # accumulate: Htot <- [[Htot, 0]; [beta_prev e1 e_last^T, Hm]]
            p = Htot.shape[0]
            Hnew = np.zeros((p + m, p + m), dtype=Htot.dtype)
            Hnew[:p, :p] = Htot
            Hnew[p:, p:] = Hm
            if p > 0:
                Hnew[p, p - 1] = beta_prev
            Htot = Hnew

            F = self.fn.eval_mat(Htot)
            coeff = beta0 * F[p: p + m, 0]
            Vm = Varr[:, :m]
            upd = Vm @ jnp.asarray(coeff.astype(Htot.dtype), dtype=None)
            if np.issubdtype(dtype, np.complexfloating) or not np.iscomplexobj(coeff):
                upd = Vm @ jnp.asarray(coeff, dtype=dtype)
            x_acc = x_acc + upd
            err = float(jnp.linalg.norm(upd))
            ref = max(float(jnp.linalg.norm(x_acc)), 1e-300)
            if err <= self.tol * ref or bool(brk) or beta < 1e-14 * beta0:
                self.reason = MFNConvergedReason.CONVERGED_TOL
                break
            beta_prev = beta
            v = Varr[:, m]
        else:
            self.reason = MFNConvergedReason.DIVERGED_ITS
        return x_acc
