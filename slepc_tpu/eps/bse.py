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
        variant = str(getattr(eps, "bse_variant", "") or "auto").lower()
        if variant == "projected":
            return self._solve_projected(eps, H)
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


    def _solve_projected(self, eps: EPS, H: MatBSE) -> None:
        """ProjectedBSE variant (reference ks-bse.c:403-723, solve at
        :932): Lanczos on HALF-size blocks keeping two coupled bases
        X, Y with the pseudo-inner-product orthogonalization
            c1 = X^H hx - Y^H hy,   c2 = -Y^T hx + X^T hy,
            hx <- hx - X c1 - conj(Y) c2,
        which projects H = [R C; -conj(C) -conj(R)] to a REAL symmetric
        tridiagonal in lambda^2; thick restart in compact diag+arrow form
        (ds/compact.solve_arrow_hep).  Eigenvectors reconstruct as
        [d1 x + d2 conj(y); d1 y + d2 conj(x)] with d1 = lambda+1,
        d2 = lambda-1 (EPSComputeVectors_BSE_ProjectedBSE role).
        """
        from ..ds.compact import solve_arrow_hep

        R, C = H.R, H.C
        n = R.shape[0]
        nev = eps.nev
        ncv = min(eps.ncv or max(2 * nev, nev + 15), n - 1)
        tol = eps.tol
        max_it = eps.max_it or max(100, 2 * n // ncv)

        def hm(z, s):
            zr = jnp.asarray(z)
            return (np.asarray(R.mult(zr))
                    + s * np.asarray(C.mult(jnp.conj(zr))))

        X = np.zeros((n, ncv + 1), complex)
        Y = np.zeros((n, ncv + 1), complex)
        a = np.zeros(ncv)
        b = np.zeros(ncv + 1)
        rng = np.random.default_rng(0)
        u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        if eps.initial_space is not None:
            u = np.asarray(eps.initial_space[:n, 0]).astype(complex)
        u /= np.linalg.norm(u)
        v = hm(u, 1.0)
        nrm = np.sqrt(max(np.vdot(u, v).real, 1e-300))
        u /= 2 * nrm
        v /= 2 * nrm
        X[:, 0] = u + v
        Y[:, 0] = np.conj(u - v)

        fill = 0   # locked + kept columns (restart boundary)
        k2 = 0
        lam = errest = None
        eps.its = 0
        while eps.its < max_it:
            eps.its += 1
            nv = ncv
            brk = False
            for j in range(fill, nv):
                uj = hm(v, -1.0)
                hx = uj + v
                hy = np.conj(uj - v)
                ncols = j + 1
                lloc = 0 if j == fill else j - 1
                h1 = np.zeros(ncols, complex)
                h2 = np.zeros(ncols, complex)
                h1[lloc:j] = b[lloc:j]
                h2[lloc:j] = b[lloc:j]
                araw = np.vdot(X[:, j], hx) - np.vdot(Y[:, j], hy)
                h1[j] = araw
                h2[j] = araw - 1.0
                hx = hx - X[:, lloc:ncols] @ h1[lloc:] \
                    - np.conj(Y[:, lloc:ncols]) @ h2[lloc:]
                hy = np.conj(hx)
                Xa = X[:, :ncols]
                Ya = Y[:, :ncols]
                c1 = Xa.conj().T @ hx - Ya.conj().T @ hy
                c2 = -Ya.T @ hx + Xa.T @ hy
                hx = hx - Xa @ c1 - np.conj(Ya) @ c2
                h1 = h1 + c1
                a[j] = 2.0 * (h1[j].real - 0.5)
                v = hm(hx, 1.0)
                g = np.vdot(hx, v).real
                if g < -1e-10 * max(1.0, abs(a[j])):
                    # the pseudo-inner product went negative: the BSE
                    # pencil is not definite — same failure the reference
                    # reports as a hard error (ks-bse.c PetscCheck)
                    raise ValueError(
                        "projected BSE: indefinite pencil (u^H H u < 0); "
                        "the BSE structure requires a definite M")
                b[j] = 2.0 * np.sqrt(max(g, 0.0))
                if b[j] < 1e-14 * max(1.0, abs(a[j])):
                    brk = True
                    nv = j + 1
                    break
                u2 = hx / b[j]
                v = v / b[j]
                X[:, j + 1] = u2 + v
                Y[:, j + 1] = np.conj(u2 - v)

            w, Q = solve_arrow_hep(a[:nv], b[:nv - 1], fill)  # asc, = lam^2
            lam_all = np.sqrt(np.maximum(w, 0.0))
            beta_nv = b[nv - 1]
            last = Q[nv - 1, :]
            errest = beta_nv * np.abs(last) / np.maximum(lam_all, 1e-300)
            conv = errest < tol
            k2 = 0
            while k2 < nv and conv[k2]:
                k2 += 1
            lam = lam_all
            if len(eps.monitor):
                eps.monitor(eps, eps.its, k2, lam_all, errest)
            done = k2 >= nev or eps.its >= max_it or brk
            l = 0 if done else min(max(1, (nv - k2) // 2),
                                   max(nv - k2 - 1, 0))
            kl = min(k2 + l, nv - 1)
            Qk = Q[:, :kl]
            X[:, :kl] = X[:, :nv] @ Qk
            Y[:, :kl] = Y[:, :nv] @ Qk
            X[:, kl] = X[:, nv]
            Y[:, kl] = Y[:, nv]
            a[:kl] = w[:kl]
            b[:kl] = beta_nv * last[:kl]
            fill = kl
            if done:
                break

        k2 = min(k2, nev)
        eps.nconv = k2
        if k2 == 0:
            eps.eigenvalues = np.array([])
            eps.errests = np.array([])
            eps._eigenvectors = np.zeros((2 * n, 0), complex)
            return
        lamk = lam[:k2]
        # eigenvector reconstruction + true residuals
        Z = np.zeros((2 * n, k2), complex)
        for i in range(k2):
            d1, d2 = lamk[i] + 1.0, lamk[i] - 1.0
            x1, y1 = X[:, i], Y[:, i]
            Z[:n, i] = d1 * x1 + d2 * np.conj(y1)
            Z[n:, i] = d1 * y1 + d2 * np.conj(x1)
        nrmz = np.linalg.norm(Z, axis=0)
        nrmz[nrmz == 0] = 1
        Z = Z / nrmz
        HZ = np.asarray(H.mult(jnp.asarray(Z)))
        res = np.linalg.norm(HZ - Z * lamk[None, :], axis=0)
        eps.eigenvalues = lamk
        eps.errests = res / np.maximum(lamk, 1e-300)
        eps._eigenvectors = Z


EPS.register("bse", KrylovSchurBSE)
