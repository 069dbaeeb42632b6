"""EPS BSE — structure-preserving Bethe–Salpeter eigensolver.

Reference: src/eps/impls/krylov/krylovschur/ks-bse.c (1,018 LoC; Shao /
Gruning / projected variants): exploit H = [R C; -C^H -R^T] so eigenvalues
come in +-lambda pairs and the work happens on n-size blocks instead of 2n.

Real definite case (R, C real; R+-C SPD), the Shao reduction:
with u = x+y, v = x-y:  (R+C) u = lambda v,  (R-C) v = lambda u
=>  (R-C)(R+C) u = lambda^2 u, a self-adjoint operator in the (R+C)
inner product — solved by our B-metric Krylov-Schur on n-vectors.
Eigenvector reconstruction: v = (R+C) u / lambda; x = (u+v)/2, y=(u-v)/2.
Complex case falls back to non-Hermitian Krylov-Schur on the full H.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mat.linop import ProductOperator, ShellOperator, SumOperator
from ..mat.structured import MatBSE
from ..sys.sort import Which
from .base import EPS, EPSSolver, ProblemType


class KrylovSchurBSE(EPSSolver):
    def solve(self, eps: EPS) -> None:
        H = eps.A
        if not isinstance(H, MatBSE):
            raise ValueError("bse solver requires a MatBSE operator (create_bse)")
        R, C = H.R, H.C
        dtype = np.dtype(R.dtype)
        if np.issubdtype(dtype, np.complexfloating):
            # complex BSE: fall back to general non-Hermitian KS on H
            from .krylovschur import KrylovSchur

            inner = EPS(H, problem_type=ProblemType.NHEP,
                        which=Which.SMALLEST_MAGNITUDE,
                        nev=2 * eps.nev, ncv=eps.ncv and 2 * eps.ncv,
                        tol=eps.tol, max_it=eps.max_it)
            inner.setup()
            KrylovSchur().solve(inner)
            eps.its = inner.its
            sel = np.real(inner.eigenvalues[: inner.nconv]) > 0
            eps.eigenvalues = inner.eigenvalues[: inner.nconv][sel][: eps.nev]
            eps.nconv = len(eps.eigenvalues)
            eps.errests = inner.errests[: inner.nconv][sel][: eps.nev]
            eps._eigenvectors = inner._eigenvectors[:, : inner.nconv][:, sel][:, : eps.nev]
            return

        n = R.shape[0]
        ApB = SumOperator((R, C), (1.0, 1.0))  # R + C
        AmB = SumOperator((R, C), (1.0, -1.0))  # R - C
        op = ProductOperator((AmB, ApB))  # (R-C)(R+C), self-adjoint in (R+C)

        inner = EPS(op, ApB, problem_type=ProblemType.GHEP,
                    which=Which.SMALLEST_REAL,
                    nev=eps.nev, ncv=eps.ncv, tol=eps.tol, max_it=eps.max_it)
        # GHEP machinery runs a B-orthogonal (here (R+C)-orthogonal) Krylov
        # basis on op directly: set a shift ST with no B-solve by treating
        # op as the operator and ApB only as the metric
        from ..st.st import STShift

        class _MetricOnlyShift(STShift):
            def _compute_operator(self):
                return self.A

        inner.set_st(_MetricOnlyShift([op]))
        inner.solve()
        eps.its = inner.its
        k = inner.nconv
        lam2 = np.real(inner.eigenvalues[:k])
        pos = lam2 > 0
        lam2 = lam2[pos]
        lam = np.sqrt(lam2)
        U = inner._eigenvectors[:, :k][:, pos]
        if np.iscomplexobj(U):
            U = U.real  # GHEP pairs of the real reduced problem are real
        # reconstruct (x; y)
        Uj = jnp.asarray(U, dtype=dtype)
        Vv = np.asarray(ApB.mult(Uj)) / lam[None, :]
        X = 0.5 * (U + Vv)
        Y = 0.5 * (U - Vv)
        Z = np.concatenate([X, Y], axis=0)
        nrm = np.linalg.norm(Z, axis=0)
        nrm[nrm == 0] = 1
        order = np.argsort(lam)
        eps.nconv = len(lam)
        eps.eigenvalues = lam[order]
        eps.errests = inner.errests[:k][pos][order] if len(inner.errests) >= k else \
            np.zeros(len(lam))
        eps._eigenvectors = (Z / nrm)[:, order]


EPS.register("bse", KrylovSchurBSE)
