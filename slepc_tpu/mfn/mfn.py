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
        self.A = A
        self.fn = fn if fn is not None else FNExp()
        self.ncv = ncv
        self.tol = tol
        self.max_it = max_it
        self.solver = solver
        self.its = 0
        self.reason = MFNConvergedReason.ITERATING

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
