"""EPS BSE — structure-preserving Bethe–Salpeter eigensolver.

Reference: src/eps/impls/krylov/krylovschur/ks-bse.c (1,018 LoC; Shao /
Gruning / projected variants): exploit H = [R C; -C^H -R^T] so eigenvalues
come in +-lambda pairs and the work happens on n-size blocks instead of 2n.

Real definite case (R, C real; R+-C SPD), the Shao reduction:
with u = x+y, v = x-y:  (R+C) u = lambda v,  (R-C) v = lambda u
=>  (R-C)(R+C) u = lambda^2 u, a self-adjoint operator in the (R+C)
inner product — solved by our B-metric Krylov-Schur on n-vectors.
Eigenvector reconstruction: v = (R+C) u / lambda; x = (u+v)/2, y=(u-v)/2.

Complex definite case (the Gruning-variant role, ks-bse.c): H = J M with
J = diag(I, -I) and M = [R C; conj(C) conj(R)] Hermitian positive
definite, so H is self-adjoint in the M-inner product and has real
eigenvalues in +- pairs.  Smallest positive pairs: M-metric Krylov-Schur
on H^{-1} = M^{-1} J (one HPD solve with M per iteration; M x is a free
sign flip of H x).  Largest pairs: M-metric Krylov-Schur on H directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mat.linop import (AIJOperator, ProductOperator, ShellOperator,
                         SumOperator)
from ..mat.structured import MatBSE
from ..sys.sort import Which
from .base import EPS, EPSSolver, ProblemType


class KrylovSchurBSE(EPSSolver):
    def solve(self, eps: EPS) -> None:
        # BSE targets the smallest positive excitation energies; make the
        # final best-first ordering ascending unless the user explicitly
        # asked for the top of the spectrum (reference ks-bse.c default)
        if eps.which not in (Which.LARGEST_REAL,):
            eps.which = Which.SMALLEST_REAL
        H = eps.A
        if not isinstance(H, MatBSE):
            raise ValueError("bse solver requires a MatBSE operator (create_bse)")
        R, C = H.R, H.C
        dtype = np.dtype(R.dtype)
        if np.issubdtype(dtype, np.complexfloating):
            return self._solve_complex(eps, H)

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

    def _solve_complex(self, eps: EPS, H: MatBSE) -> None:
        """Structure-preserving complex definite BSE (Gruning-variant role).

        Reference: ks-bse.c Gruning method — Lanczos on H in the HPD
        M = J*H inner product keeps a REAL symmetric tridiagonal and
        +-paired real Ritz values; here via the B-metric Krylov-Schur
        with M as metric.  Smallest positive eigenvalues (the physical
        excitation energies) come from H^{-1} = M^{-1} J, one HPD solve
        with M per Krylov step.
        """
        from ..ksp.ksp import KSP
        from ..st.st import STShift

        R, C = H.R, H.C
        n = R.shape[0]
        dtype = np.result_type(R.dtype, C.dtype)

        def m_mult(x):
            y = H.mult(x)
            return jnp.concatenate([y[:n], -y[n:]], axis=0)

        Mop = ShellOperator((2 * n, 2 * n), dtype, m_mult, m_mult,
                            nnz=H.nnz)

        # default target = smallest positive excitation energies (as the
        # Shao real branch); LARGEST_REAL explicitly requests the top end
        want_largest = eps.which == Which.LARGEST_REAL
        if want_largest:
            op = ShellOperator((2 * n, 2 * n), dtype, H.mult, H.mult_h,
                               nnz=H.nnz)
        else:
            # assemble M sparse for a host factorization when the blocks
            # permit; otherwise CG on the HPD shell
            try:
                import scipy.sparse as sp

                Rs = sp.csr_matrix(R.to_scipy())
                Cs = sp.csr_matrix(C.to_scipy())
                Ms = sp.bmat([[Rs, Cs], [Cs.conj(), Rs.conj()]],
                             format="csr")
                ksp = KSP(AIJOperator.from_scipy(Ms), method="direct")
            except Exception:
                ksp = KSP(Mop, method="cg", rtol=1e-12, hermitian=True)

            host = getattr(ksp, "method", "") == "direct"

            def hinv_mult(x):
                jx = jnp.concatenate([x[:n], -x[n:]], axis=0)
                return ksp.solve(jx)

            op = ShellOperator((2 * n, 2 * n), dtype, hinv_mult,
                               nnz=H.nnz, host_callback=host)

        class _MetricOnlyShift(STShift):
            def _compute_operator(self):
                return self.A

        inner = EPS(op, Mop, problem_type=ProblemType.GHEP,
                    which=Which.LARGEST_MAGNITUDE,
                    nev=2 * eps.nev,
                    ncv=eps.ncv and 2 * eps.ncv, tol=eps.tol,
                    max_it=eps.max_it)
        inner.set_st(_MetricOnlyShift([op]))
        inner.solve()
        eps.its = inner.its
        k = inner.nconv
        mu = np.real(inner.eigenvalues[:k])
        pos = mu > 0
        lam = mu[pos] if want_largest else 1.0 / mu[pos]
        Z = np.asarray(inner._eigenvectors[:, :k][:, pos])
        order = np.argsort(lam) if not want_largest else np.argsort(-lam)
        lam, Z = lam[order][: eps.nev], Z[:, order][:, : eps.nev]
        nrm = np.linalg.norm(Z, axis=0)
        nrm[nrm == 0] = 1
        Z = Z / nrm
        # true residuals of the original Hamiltonian
        HZ = np.asarray(H.mult(jnp.asarray(Z, dtype=dtype)))
        res = np.linalg.norm(HZ - Z * lam[None, :], axis=0)
        eps.nconv = len(lam)
        eps.eigenvalues = lam
        eps.errests = res / np.maximum(np.abs(lam), 1e-300)
        eps._eigenvectors = Z


EPS.register("bse", KrylovSchurBSE)
