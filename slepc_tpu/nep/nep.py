"""NEP — general nonlinear eigenproblems T(lambda) x = 0.

Reference: src/nep/ — user interface via callbacks (Function/Jacobian) or
*split form* T(lambda) = sum_i f_i(lambda) A_i with FN scalar functions
(nepimpl.h).  Solvers: rii (residual inverse iteration), slp (successive
linear problems: inner EPS, slp.c), narnoldi, nleigs (rational Krylov on
rational interpolation), interpol (Chebyshev interpolation -> inner PEP),
ciss (contour).

Here the split form is the primary interface; 'slp' and 'rii' are native;
'interpol' builds a Chebyshev-basis PEP; 'nleigs' and 'ciss' arrive with
the contour infrastructure.  Deflation of converged pairs uses a simple
orthogonal-projection scheme standing in for the reference's
minimality-index deflation (nepdefl.c).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..eps.base import EPS, ProblemType
from ..fn.fn import FN
from ..ksp import KSP
from ..mat.linop import LinearOperator, ShellOperator, SumOperator
from ..sys.sort import Which


class NEP:
    """Nonlinear eigensolver (split form or callback form)."""

    def __init__(self, *, nev: int = 1, tol: Optional[float] = None,
                 max_it: int = 100, solver: str = "slp",
                 target: complex = 0.0):
        self.split_A: List[LinearOperator] = []
        self.split_f: List[FN] = []
        self.fun: Optional[Callable[[complex], LinearOperator]] = None
        self.jac: Optional[Callable[[complex], LinearOperator]] = None
        self.nev = nev
        self.tol = tol
        self.max_it = max_it
        self.solver = solver
        self.target = target
        self.rg = None
        self.nconv = 0
        self.its = 0
        self.two_sided = False
        from ..sys.options import apply_module_options

        self.nleigs_full_basis = False
        apply_module_options(self, "nep_", int_keys=("nev", "max_it"),
                             float_keys=("tol",), str_keys=("type",),
                             bool_keys=("two_sided", "nleigs_full_basis"))
        self.eigenvalues = np.array([], dtype=complex)
        self.errests = np.array([])
        self._eigenvectors: Optional[np.ndarray] = None
        self._left_eigenvectors: Optional[np.ndarray] = None

    # -- problem definition -----------------------------------------------
    def set_split_operators(self, mats: Sequence[LinearOperator],
                            fns: Sequence[FN]):
        assert len(mats) == len(fns)
        self.split_A = list(mats)
        self.split_f = list(fns)
        return self

    def set_function(self, fun: Callable[[complex], LinearOperator],
                     jac: Optional[Callable[[complex], LinearOperator]] = None):
        self.fun = fun
        self.jac = jac
        return self

    def set_target(self, t: complex):
        self.target = t
        return self

    def set_type(self, name: str):
        self.solver = name
        return self

    def set_dimensions(self, nev=None):
        if nev is not None:
            self.nev = nev
        return self

    def set_tolerances(self, tol=None, max_it=None):
        if tol is not None:
            self.tol = tol
        if max_it is not None:
            self.max_it = max_it
        return self

    # -- T(lambda), T'(lambda) as operators --------------------------------
    @property
    def n(self) -> int:
        if self.split_A:
            return self.split_A[0].shape[0]
        return self.fun(self.target).shape[0]

    def T(self, lam: complex) -> LinearOperator:
        if self.fun is not None:
            return self.fun(lam)
        coeffs = tuple(complex(f.eval(lam)) for f in self.split_f)
        return SumOperator(tuple(self.split_A), coeffs)

    def Tprime(self, lam: complex) -> LinearOperator:
        if self.jac is not None:
            return self.jac(lam)
        if self.fun is not None:
            # finite-difference Jacobian fallback
            h = 1e-7 * max(1.0, abs(lam))
            Tp = self.fun(lam + h)
            Tm = self.fun(lam - h)
            return SumOperator((Tp, Tm), (0.5 / h, -0.5 / h))
        coeffs = tuple(complex(f.eval_deriv(lam)) for f in self.split_f)
        return SumOperator(tuple(self.split_A), coeffs)

    # -- solve -------------------------------------------------------------
    def solve(self):
        if self.tol is None:
            self.tol = 1e-9
        if self.solver == "slp":
            self._solve_newton(improve="slp")
        elif self.solver == "rii":
            self._solve_newton(improve="rii")
        elif self.solver == "narnoldi":
            self._solve_narnoldi()
        elif self.solver == "interpol":
            self._solve_interpol()
        elif self.solver == "ciss":
            self._solve_ciss()
        elif self.solver == "nleigs":
            self._solve_nleigs()
        else:
            raise ValueError(f"unknown NEP solver {self.solver!r}")
        if self.two_sided:
            _attach_two_sided(self)
        return self

    def set_two_sided(self, flg: bool = True):
        self.two_sided = flg
        return self

    def get_left_eigenvector(self, i: int) -> np.ndarray:
        if self._left_eigenvectors is None:
            raise ValueError("no left eigenvectors (enable set_two_sided)")
        return self._left_eigenvectors[:, i]

    def apply_resolvent(self, z: complex, v) -> np.ndarray:
        """Action of the resolvent from the computed eigentriplets
        (reference: NEPApplyResolvent, interface/nepresolv.c):
        R(z) v = sum_i x_i (y_i^H v) / ((z - lam_i) * (y_i^H T'(lam_i) x_i)).
        Requires a two-sided solve."""
        import jax.numpy as _jnp

        if self._left_eigenvectors is None:
            _attach_two_sided(self)
        v = np.asarray(v, dtype=complex)
        out = np.zeros_like(v)
        for i in range(self.nconv):
            lam = complex(self.eigenvalues[i])
            x = self._eigenvectors[:, i].astype(complex)
            y = self._left_eigenvectors[:, i]
            tp = np.asarray(self.Tprime(lam).mult(_jnp.asarray(x)))
            denom = (z - lam) * (y.conj() @ tp)
            if abs(denom) < 1e-300:
                continue
            out += x * ((y.conj() @ v) / denom)
        return out

    def _residual(self, lam, x):
        r = self.T(lam).mult(x)
        return float(jnp.linalg.norm(r)) / max(float(jnp.linalg.norm(x)), 1e-300)

    def _solve_newton(self, improve: str):
        """SLP (reference slp.c: eigen-correction mu from the pencil
        (T(lam), T'(lam))) and RII (reference rii.c: fixed preconditioner
        T(sigma)^{-1}, Rayleigh-functional update).

        Deflation of converged pairs: for SLP with a dense path available,
        EFFENBERGER minimal-invariant-pair deflation (reference:
        nepdefl.c) — the extended problem
          T~(lam) = [[T(lam), T(lam) X (lam I - H)^{-1}], [X^H, 0]]
        is analytic, removes exactly the deflated eigenvalues, and stays
        well-posed for multiple/clustered eigenvalues where orthogonal
        projection fails; the converged pair extends (X, H).  RII and the
        large-n path keep orthogonal-projection deflation."""
        n = self.n
        found_lam: List[complex] = []
        found_x: List[np.ndarray] = []
        errs: List[float] = []
        self.its = 0
        rng = np.random.default_rng(0)
        use_defl = (improve == "slp" and n <= 2048
                    and getattr(self, "deflation", "effenberger")
                    == "effenberger")
        Xp = np.zeros((n, 0), dtype=complex)  # invariant-pair basis
        Hp = np.zeros((0, 0), dtype=complex)  # invariant-pair H

        import scipy.linalg as sla

        for pair in range(self.nev):
            k = Xp.shape[1]
            lam = complex(self.target) + (0.0 if use_defl and k else
                                          (0.01 * pair if found_lam else 0.0))
            if use_defl and k:
                # ---- SLP on the Effenberger-extended problem ----
                Ik = np.eye(k, dtype=complex)

                def Ttil(z):
                    Td = self._dense_T(z).astype(complex)
                    G = np.linalg.solve(z * Ik - Hp, Ik)
                    U = Td @ Xp @ G
                    return np.block([[Td, U],
                                     [Xp.conj().T,
                                      np.zeros((k, k), dtype=complex)]])

                def Ttil_prime(z):
                    Td = self._dense_T(z).astype(complex)
                    Tp = np.asarray(self.Tprime(z).to_dense()).astype(complex)
                    G = np.linalg.solve(z * Ik - Hp, Ik)
                    Up = Tp @ Xp @ G - Td @ Xp @ (G @ G)
                    return np.block([[Tp, Up],
                                     [np.zeros((k, n + k), dtype=complex)]])

                y = None
                converged = False
                for it in range(self.max_it):
                    self.its += 1
                    mu_, Yp = sla.eig(Ttil(lam), Ttil_prime(lam))
                    fin = np.isfinite(mu_)
                    mu_, Yp = mu_[fin], Yp[:, fin]
                    if mu_.size == 0:
                        break
                    j = int(np.argmin(np.abs(mu_)))
                    lam = lam - mu_[j]
                    y = Yp[:, j] / np.linalg.norm(Yp[:, j])
                    rext = np.linalg.norm(Ttil(lam) @ y)
                    if rext < self.tol:
                        converged = True
                        break
                if y is None:
                    break
                s = np.linalg.solve(lam * Ik - Hp, y[n:])
                xt = y[:n] + Xp @ s
                nx = np.linalg.norm(xt)
                if nx < 1e-12:
                    break
                xt, s = xt / nx, s / nx
                # extend the minimal invariant pair
                Xp = np.concatenate([Xp, xt[:, None]], axis=1)
                Hp = np.block([[Hp, s[:, None]],
                               [np.zeros((1, k), dtype=complex),
                                np.array([[lam]], dtype=complex)]])
                found_lam.append(complex(lam))
                found_x.append(xt)
                errs.append(self._residual(complex(lam), jnp.asarray(xt)))
                if not converged:
                    break
                continue

            x = rng.standard_normal(n) + 0j
            # deflate: orthogonalize against converged vectors
            for xf in found_x:
                x = x - xf * (np.conj(xf) @ x)
            x /= np.linalg.norm(x)
            xj = jnp.asarray(x)
            ksp_rii = None
            if improve == "rii":
                ksp_rii = KSP(self.T(lam), method="direct")
            converged = False
            for it in range(self.max_it):
                self.its += 1
                Tl = self.T(lam)
                res = Tl.mult(xj)
                rnorm = float(jnp.linalg.norm(res)) / max(float(jnp.linalg.norm(xj)), 1e-300)
                if rnorm < self.tol:
                    converged = True
                    break
                if improve == "slp":
                    # mu = smallest eigenvalue of T(lam) y = mu T'(lam) y
                    Tp = self.Tprime(lam)
                    mu, y = _smallest_pencil_eig(Tl, Tp, found_x)
                    lam = lam - mu
                    xj = y
                else:  # rii
                    # x <- x - T(sigma)^{-1} T(lam) x; Rayleigh update
                    dx = ksp_rii.solve(res)
                    xj = xj - dx
                    for xf in found_x:
                        xfj = jnp.asarray(xf)
                        xj = xj - xfj * (jnp.vdot(xfj, xj))
                    xj = xj / jnp.linalg.norm(xj)
                    lam = _rayleigh_functional(self, lam, xj)
            xnp = np.asarray(xj)
            xnp = xnp / np.linalg.norm(xnp)
            found_lam.append(lam)
            found_x.append(xnp)
            errs.append(self._residual(lam, jnp.asarray(xnp)))
            if use_defl:
                # seed the invariant pair from the first converged vector
                Xp = np.concatenate([Xp, xnp[:, None]], axis=1)
                Hp = np.array([[lam]], dtype=complex)
            if not converged:
                break

        self.nconv = sum(1 for e in errs if e < self.tol * 100)
        self.eigenvalues = np.array(found_lam)
        self.errests = np.array(errs)
        self._eigenvectors = (np.stack(found_x, axis=1)
                              if found_x else np.zeros((n, 0), dtype=complex))

    def _solve_narnoldi(self):
        """Nonlinear Arnoldi (reference narnoldi.c): project T(lambda) on a
        growing subspace, solve the projected NEP, expand with the
        preconditioned residual."""
        n = self.n
        rng = np.random.default_rng(0)
        v = rng.standard_normal(n) + 0j
        v /= np.linalg.norm(v)
        Vb = [v]
        lam = complex(self.target)
        ksp = KSP(self.T(lam), method="direct")
        x = jnp.asarray(v)
        self.its = 0
        err = np.inf
        for it in range(self.max_it):
            self.its += 1
            V = np.stack(Vb, axis=1)
            Vj = jnp.asarray(V)

            def Tproj(z):
                TV = np.asarray(self.T(z).mult(Vj))
                return V.conj().T @ TV

            def Jproj(z):
                TV = np.asarray(self.Tprime(z).mult(Vj))
                return V.conj().T @ TV

            from ..ds.types import DSNEP

            lam, y = DSNEP().solve_slp(Tproj, Jproj, lam)
            x = Vj @ jnp.asarray(y)
            res = self.T(lam).mult(x)
            err = float(jnp.linalg.norm(res)) / max(float(jnp.linalg.norm(x)), 1e-300)
            if err < self.tol:
                break
            d = np.asarray(ksp.solve(res))
            for u in Vb:
                d = d - u * (np.conj(u) @ d)
            nd = np.linalg.norm(d)
            if nd < 1e-14:
                break
            Vb.append(d / nd)
        xnp = np.asarray(x)
        self.nconv = 1 if err < self.tol else 0
        self.eigenvalues = np.array([lam])
        self.errests = np.array([err])
        self._eigenvectors = (xnp / np.linalg.norm(xnp))[:, None]

    def _solve_interpol(self):
        """Chebyshev interpolation -> PEP (reference interpol.c): sample the
        split scalar functions on an interval around the target, build a
        Chebyshev-basis polynomial approximation, and solve the PEP."""
        if not self.split_f:
            raise ValueError("interpol requires split form")
        from ..pep.pep import PEP

        deg = 12
        # interpolation interval around the target (real interval)
        t = complex(self.target).real
        rad = max(abs(t) * 0.5, 1.0)
        a, b = t - rad, t + rad
        # Chebyshev nodes and monomial-coefficient fit per scalar function
        nodes = np.cos(np.pi * (np.arange(deg + 1) + 0.5) / (deg + 1))
        xs = 0.5 * (b - a) * nodes + 0.5 * (b + a)
        # build polynomial coefficient matrices: P(lam) = sum_k lam^k C_k
        Vand = np.vander(xs, deg + 1, increasing=True)
        coef_per_fn = []
        for f in self.split_f:
            vals = np.array([f.eval(xi) for xi in xs])
            c, *_ = np.linalg.lstsq(Vand, vals, rcond=None)
            coef_per_fn.append(c)
        mats = []
        for k in range(deg + 1):
            coeffs = tuple(c[k] for c in coef_per_fn)
            mats.append(SumOperator(tuple(self.split_A), coeffs))
        pep = PEP(mats, nev=self.nev, target=self.target,
                  tol=max(self.tol * 0.01, 1e-12), solver="linear")
        pep.solve()
        self.its = pep.its
        lams, errs, xs_ = [], [], []
        for i in range(pep.nconv):
            lam_i, x_i = pep.get_eigenpair(i)
            e = self._residual(complex(lam_i), jnp.asarray(x_i))
            lams.append(complex(lam_i))
            errs.append(e)
            xs_.append(np.asarray(x_i))
        self.eigenvalues = np.array(lams)
        self.errests = np.array(errs)
        self.nconv = sum(1 for e in errs if e < self.tol * 100)
        self._eigenvectors = (np.stack(xs_, axis=1) if xs_
                              else np.zeros((self.n, 0), dtype=complex))

    def _dense_T(self, lam: complex) -> np.ndarray:
        return np.asarray(self.T(lam).to_dense())

    def _solve_at_factory(self):
        """Returns solve_at(z, R) = T(z)^{-1} R (factorizing per point)."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        if self.split_A and all(hasattr(m, "to_scipy") for m in self.split_A):
            mats_sc = [m.to_scipy() for m in self.split_A]
            sparse = any(sp.issparse(M) for M in mats_sc)

            def solve_at(z, R):
                coeffs = [complex(f.eval(z)) for f in self.split_f]
                Tz = sum(c * (M if not sparse or sp.issparse(M) else sp.csr_matrix(M))
                         for c, M in zip(coeffs, mats_sc))
                if sparse:
                    return spla.splu(sp.csc_matrix(Tz, dtype=complex)).solve(
                        R.astype(complex))
                return np.linalg.solve(np.asarray(Tz, dtype=complex),
                                       R.astype(complex))

            return solve_at

        def solve_at(z, R):
            return np.linalg.solve(self._dense_T(z).astype(complex),
                                   R.astype(complex))

        return solve_at

    def _solve_ciss(self, rg=None):
        """Contour-integral NEP solver (reference: src/nep/impls/ciss/
        nciss.c): block-Hankel Beyn extraction from the moments
        S_k = (1/2πi) ∮ z^k T(z)^{-1} V dz — only eigenvalues enclosed by
        the contour survive; Newton (Rayleigh-functional) polishing brings
        each pair to tolerance."""
        from ..rg.rg import RGEllipse
        from ..sys.contour import contour_moments

        rg = rg or getattr(self, "rg", None)
        if rg is None:
            rg = RGEllipse(center=self.target, radius=max(abs(self.target) * 0.5, 1.0))
        self.rg = rg
        n = self.n
        L = min(24, n)
        mhat = 2
        M = 2 * mhat
        npt = 48
        z, w = rg.contour(npt)
        rng = np.random.default_rng(0)
        V = rng.standard_normal((n, L))
        solve_at = self._solve_at_factory()
        S = contour_moments(solve_at, V, z, w, M)
        Sk = [S[:, k * L: (k + 1) * L] for k in range(M)]
        H0 = np.block([[Sk[i + j] for j in range(mhat)] for i in range(mhat)])
        H1 = np.block([[Sk[i + j + 1] for j in range(mhat)] for i in range(mhat)])
        U, sv, Wh = np.linalg.svd(H0, full_matrices=False)
        r = int(np.sum(sv > 1e-10 * max(sv[0] if sv.size else 0.0, 1e-300)))
        r = max(r, 1)
        U1, sv1, W1 = U[:, :r], sv[:r], Wh[:r, :].conj().T
        Bm = U1.conj().T @ H1 @ W1 / sv1[None, :]
        mu, Y = np.linalg.eig(Bm)
        X = U1[:n, :] @ Y  # first block row carries the eigenvectors
        keep = []
        for i, lmb in enumerate(mu):
            if rg.check_inside(lmb) < 0:
                continue
            x = X[:, i]
            nx = np.linalg.norm(x)
            if nx < 1e-12:
                continue
            x = x / nx
            lmb = complex(lmb)
            # Newton polish (Rayleigh functional + one inverse step)
            for _ in range(10):
                e = self._residual(lmb, jnp.asarray(x))
                if e < self.tol:
                    break
                Tl = self.T(lmb)
                try:
                    dx = np.linalg.solve(np.asarray(Tl.to_dense()).astype(complex),
                                         np.asarray(Tl.mult(jnp.asarray(x))))
                except np.linalg.LinAlgError:
                    break
                x = x - dx
                x = x / np.linalg.norm(x)
                lmb = _rayleigh_functional(self, lmb, jnp.asarray(x))
            e = self._residual(lmb, jnp.asarray(x))
            if all(abs(lmb - kk[0]) > 1e-8 * max(1.0, abs(lmb)) for kk in keep):
                keep.append((lmb, e, x))
        c = complex(getattr(rg, "center", self.target))
        keep.sort(key=lambda t: abs(t[0] - c))
        self.its = 1
        self.eigenvalues = np.array([t[0] for t in keep])
        self.errests = np.array([t[1] for t in keep])
        self._eigenvectors = (np.stack([t[2] for t in keep], axis=1)
                              if keep else np.zeros((n, 0), dtype=complex))
        self.nconv = int(np.sum(self.errests < max(self.tol * 100, 1e-8)))

    def set_singularities(self, points):
        """Discretized singularity set Xi of T (reference:
        NEPNLEIGSSetSingularitiesFunction) — the pole candidates for the
        Leja-Bagby rational interpolation.  Without it, poles are detected
        automatically from the AAA approximation of a scalar surrogate."""
        self._singularities = np.asarray(points, dtype=complex)
        return self

    def _nleigs_surrogate(self, samples: np.ndarray) -> np.ndarray:
        """Scalar surrogate of T on sample points (random combination of
        the split scalar functions, or a random bilinear form of T)."""
        rng = np.random.default_rng(1)
        if self.split_f:
            coeffs_r = rng.standard_normal(len(self.split_f))
            return np.sum([cr * np.asarray([f.eval(s) for s in samples])
                           for cr, f in zip(coeffs_r, self.split_f)], axis=0)
        n = self.n
        u = rng.standard_normal(n)
        v = rng.standard_normal(n)
        return np.array([v @ np.asarray(self.T(s).mult(jnp.asarray(
            u, dtype=complex))) for s in samples])

    def _solve_nleigs(self, rg=None):
        """NLEIGS (reference: src/nep/impls/nleigs/nleigs.c; Guettel, Van
        Beeumen, Meerbergen, Michiels, SISC 2014): rational interpolation
        of T on Leja-Bagby nodes s_j (target set) with poles xi_j
        (singularity set), T(lam) ~ Q_d(lam) = sum_j D_j b_j(lam) in the
        rational Newton basis b_{j+1}(z) = b_j(z)(z-s_j)/(beta_{j+1}
        (1-z/xi_j)); the d*n companion-with-poles linearization is solved
        by shift-invert Arnoldi at sigma=target with ONE factorization of
        Q_d(sigma) — all block arithmetic is batched device work, only the
        n x n solve goes through KSP.
        """
        from ..rg.rg import RGEllipse

        rg = rg or getattr(self, "rg", None)
        if rg is None:
            rg = RGEllipse(center=self.target,
                           radius=max(abs(self.target) * 0.5, 1.0))
        self.rg = rg
        c = complex(getattr(rg, "center", self.target))
        sigma = complex(self.target)
        n = self.n
        ddmaxit = 100  # LBPOINTS (reference nleigs.h:16)
        ddtol = max(self.tol / 10.0, 1e-14)

        # --- discretize target boundary and singularity set ---
        ds, _w = rg.contour(128)
        ds = np.asarray(ds, dtype=complex)
        dxi = getattr(self, "_singularities", None)
        if dxi is None:
            dxi = _aaa_singularities(self, ds)
        dxi = np.asarray(dxi, dtype=complex) if dxi is not None else \
            np.zeros(0, dtype=complex)

        # --- Leja-Bagby points / poles / scalings ---
        s, xi, beta = _leja_bagby(ds, dxi, ddmaxit)

        # --- rational divided differences (split or dense callback) ---
        if self.split_f:
            nt = len(self.split_f)
            fvals = np.array([[complex(f.eval(sk)) for f in self.split_f]
                              for sk in s])  # (ddmaxit, nt)
            coeffD = np.zeros((ddmaxit, nt), dtype=complex)
            coeffD[0] = fvals[0] * beta[0]
            norm0 = np.abs(coeffD[0]).max()
            nmat = ddmaxit
            for k in range(1, ddmaxit):
                b = _rational_basis(s, xi, beta, k, s[k])
                coeffD[k] = (fvals[k]
                             - b[:k] @ coeffD[:k]) / b[k]
                if k > 1 and np.abs(coeffD[k]).max() / norm0 < ddtol:
                    nmat = k + 1
                    break
            Dmats = None
        else:
            if n > 2048:
                # matrix divided differences need explicit D_j; keep the
                # matrix-free Newton path for very large callback problems
                self._solve_newton(improve="slp")
                return
            Td = [self._dense_T(s[0]).astype(complex)]
            Dmats = [Td[0] * beta[0]]
            norm0 = np.linalg.norm(Dmats[0], np.inf)
            nmat = ddmaxit
            for k in range(1, ddmaxit):
                b = _rational_basis(s, xi, beta, k, s[k])
                Dk = self._dense_T(s[k]).astype(complex)
                for j in range(k):
                    Dk = Dk - b[j] * Dmats[j]
                Dmats.append(Dk / b[k])
                if k > 1 and np.linalg.norm(Dmats[k], np.inf) / norm0 < ddtol:
                    nmat = k + 1
                    break
            Dmats = Dmats[:nmat]
            coeffD = None
        d = nmat - 1  # linearization degree

        if d < 2:
            # interpolant is (near-)linear: plain Newton is exact
            self._solve_newton(improve="slp")
            return

        # --- Q_d(sigma) and its factorization (the only n x n solve) ---
        bsig = _rational_basis(s, xi, beta, d, sigma)
        if coeffD is not None:
            alph = bsig @ coeffD[:nmat]  # (nt,)
            Nsig = SumOperator(tuple(self.split_A), tuple(alph))
            ksp = KSP(Nsig, method="direct")
        else:
            Nd = sum(bj * Dj for bj, Dj in zip(bsig, Dmats))
            import scipy.linalg as sla

            lu = sla.lu_factor(Nd)
            ksp = None

        Aj_ops = tuple(self.split_A) if coeffD is not None else None
        betax = beta
        six = s
        # inf pole => no pole: beta/xi -> 0 and (1 - sigma/xi) -> 1
        b_over_xi = np.array([0.0 if np.isinf(xi[j]) else betax[j + 1] / xi[j]
                              for j in range(d)], dtype=complex)
        one_m_sx = np.array([1.0 if np.isinf(xi[j]) else 1.0 - sigma / xi[j]
                             for j in range(d)], dtype=complex)

        if not getattr(self, "nleigs_full_basis", False):
            # DEFAULT: compact TOAR-style basis — memory per Krylov vector
            # independent of the interpolation degree d (reference
            # nleigs.c default; nleigs-fullb.c is the full-basis OPTION,
            # selectable here via nep.nleigs_full_basis = True /
            # -nep_nleigs_fullbasis)
            from .nleigs_toar import nleigs_toar_krylov

            nleigs_toar_krylov(
                self, sigma=sigma, d=d, beta=betax, s=six, bsig=bsig,
                b_over_xi=b_over_xi, one_m_sx=one_m_sx, coeffD=coeffD,
                Aj_ops=Aj_ops, Dmats=Dmats, ksp=ksp,
                lu=lu if coeffD is None else None, rg=rg, center=c)
            return

        def shinv_apply(zflat):
            """w = (A - sigma B)^{-1} B z on the d*n linearization:
            backward substitution through the companion-with-poles block
            rows, then one Q_d(sigma) solve for the rational-basis
            component (reference NEPTOARExtendBasis semantics)."""
            Z = zflat.reshape(d, n)
            Wb = [None] * (d - 1)
            # last block row (D_d truncation folded into the first row)
            Wb[d - 2] = (Z[d - 2] + b_over_xi[d - 2] * Z[d - 1]) \
                / (six[d - 2] - sigma)
            for k in range(d - 2, 0, -1):
                Wb[k - 1] = (Z[k - 1] + b_over_xi[k - 1] * Z[k]
                             - betax[k] * one_m_sx[k - 1] * Wb[k]) \
                    / (six[k - 1] - sigma)
            # q = sum_j D_j w_j + D_d z_{d-1}/beta_d  (first block row)
            zlast = Z[d - 1] / betax[d]
            if coeffD is not None:
                q = None
                for i, Ai in enumerate(Aj_ops):
                    v = coeffD[d, i] * zlast
                    for j in range(d - 1):
                        v = v + coeffD[j, i] * Wb[j]
                    t = Ai.mult(v)
                    q = t if q is None else q + t
                t_new = -ksp.solve(q)
            else:
                q = Dmats[d] @ np.asarray(zlast)
                for j in range(d - 1):
                    q = q + Dmats[j] @ np.asarray(Wb[j])
                import scipy.linalg as sla

                t_new = jnp.asarray(-sla.lu_solve(lu, q))
            # w_j += b_j(sigma) * t  (t is the new Krylov direction)
            out = [Wb[j] + bsig[j] * t_new for j in range(d - 1)]
            out.append(bsig[d - 1] * t_new)
            return jnp.concatenate(out)

        Lop = ShellOperator((d * n, d * n), np.dtype(complex), shinv_apply,
                            host_callback=True)

        # --- shift-invert Arnoldi on the linearization ---
        eps = EPS(Lop, problem_type=ProblemType.NHEP, nev=self.nev + 2,
                  which=Which.LARGEST_MAGNITUDE)
        eps.set_tolerances(tol=max(self.tol * 1e-2, 1e-13),
                           max_it=self.max_it)
        eps.solve()
        self.its = eps.its

        found = []
        for i in range(eps.nconv):
            th, zvec = eps.get_eigenpair(i)
            th = complex(th)
            if abs(th) < 1e-300:
                continue
            lam = sigma + 1.0 / th
            x = np.asarray(zvec[:n])
            nx = np.linalg.norm(x)
            if nx < 1e-12:
                continue
            x = x / nx
            # polish on the true T (interpolation error -> full precision)
            for _ in range(10):
                e = self._residual(lam, jnp.asarray(x))
                if e < self.tol:
                    break
                lam, x = _nep_newton_step(self, lam, x)
            e = self._residual(complex(lam), jnp.asarray(x))
            if e < max(self.tol * 100, 1e-8) and rg.check_inside(lam) >= 0:
                if all(abs(lam - f[0]) > 1e-8 * max(1, abs(lam))
                       for f in found):
                    found.append((complex(lam), e, x))
        found.sort(key=lambda t: abs(t[0] - c))
        self.eigenvalues = np.array([t[0] for t in found])
        self.errests = np.array([t[1] for t in found])
        self._eigenvectors = (np.stack([t[2] for t in found], axis=1)
                              if found else np.zeros((n, 0), dtype=complex))
        self.nconv = len(found)

    def set_rg(self, rg):
        self.rg = rg
        return self

    def refine(self, steps: int = 3):
        """Newton iterative refinement of converged pairs (reference:
        NEPSetRefine simple scheme, interface/neprefine.c)."""
        import jax.numpy as jnp

        if self.nconv == 0 or self.n > 4096:
            return self
        from ..pep.pep import _bordered_newton_refine

        def apply_T(lam, xj):
            return self.T(lam).mult(xj)

        def apply_Tp(lam, xj):
            return self.Tprime(lam).mult(xj)

        def dense_T(lam):
            return np.asarray(self.T(lam).to_dense()).astype(complex)

        self.eigenvalues = self.eigenvalues.astype(complex)
        self._eigenvectors = self._eigenvectors.astype(complex)
        for i in range(self.nconv):
            lam, x = self.eigenvalues[i], self._eigenvectors[:, i]
            lam2, x2 = _bordered_newton_refine(apply_T, apply_Tp, lam, x,
                                               steps=steps, solve_dense=dense_T)
            self.eigenvalues[i] = lam2
            self._eigenvectors[:, i] = x2
            self.errests[i] = self._residual(complex(lam2), jnp.asarray(x2))
        return self

    # -- results ----------------------------------------------------------
    def get_converged(self):
        return self.nconv

    def get_eigenpair(self, i: int):
        return self.eigenvalues[i], self._eigenvectors[:, i]

    def compute_error(self, i: int) -> float:
        lam, x = self.get_eigenpair(i)
        return self._residual(complex(lam), jnp.asarray(x))


def _leja_bagby(ds: np.ndarray, dxi: np.ndarray, maxit: int):
    """Greedy Leja-Bagby node/pole selection (reference:
    NEPNLEIGSLejaBagbyPoints, nleigs.c:346): s_k maximizes |prod of scaled
    basis| over the target discretization, xi_k minimizes it over the
    singularity discretization; beta_k are the sup-norm scalings."""
    ndpt = len(ds)
    s = np.zeros(maxit, dtype=complex)
    xi = np.full(maxit, np.inf, dtype=complex)
    beta = np.ones(maxit)
    s[0] = ds[0]
    if len(dxi):
        if abs(dxi[0]) < 1e-12:
            raise ValueError("singularity point nearly zero; shift the problem")
        xi[0] = dxi[0]
    nrs = np.ones(ndpt, dtype=complex)
    nrxi = np.ones(len(dxi), dtype=complex)

    def pole_fac(z, p):  # 1 - z/p, with p=inf meaning "no pole"
        return np.ones_like(z) if np.isinf(p) else 1.0 - z / p

    for k in range(1, maxit):
        nrs = nrs * ((ds - s[k - 1]) / pole_fac(ds, xi[k - 1])) / beta[k - 1]
        imax = int(np.argmax(np.abs(nrs)))
        s[k] = ds[imax]
        beta[k] = max(np.abs(nrs[imax]), 1e-300)
        if len(dxi) > k:
            # a candidate equal to the current pole divides by zero; it
            # becomes inf and is never selected by the argmin below
            with np.errstate(divide="ignore", invalid="ignore"):
                nrxi = nrxi * ((dxi - s[k - 1])
                               / pole_fac(dxi, xi[k - 1])) / beta[k - 1]
            nrxi = np.where(np.isfinite(nrxi), nrxi, np.inf)
            imin = 1 + int(np.argmin(np.abs(nrxi[1:])))
            if abs(dxi[imin]) < 1e-12:
                raise ValueError("singularity point nearly zero; "
                                 "shift the problem")
            xi[k] = dxi[imin]
    return s, xi, beta


def _rational_basis(s, xi, beta, k: int, z: complex) -> np.ndarray:
    """b_0..b_k of the rational Newton basis at z (reference:
    NEPNLEIGSEvalNRTFunct): b_{j+1}(z)=b_j(z)(z-s_j)/(beta_{j+1}(1-z/xi_j))."""
    b = np.zeros(k + 1, dtype=complex)
    b[0] = 1.0 / beta[0]
    for i in range(k):
        pf = 1.0 if np.isinf(xi[i]) else 1.0 - z / xi[i]
        b[i + 1] = (z - s[i]) * b[i] / (beta[i + 1] * pf)
    return b


def _aaa_singularities(nep: "NEP", ds: np.ndarray):
    """Automatic singularity discretization: poles of the AAA rational
    approximation of a scalar surrogate of T on the target boundary
    (reference: NEPNLEIGSAAASingularities, nleigs.c:299)."""
    try:
        from scipy.interpolate import AAA
    except ImportError:  # pragma: no cover
        return None
    vals = nep._nleigs_surrogate(ds)
    try:
        aaa = AAA(ds, vals, rtol=1e-13)
        poles = np.asarray(aaa.poles(), dtype=complex)
    except Exception:
        return None
    poles = poles[np.isfinite(poles)]
    if poles.size == 0:
        return None
    # order by distance to the target set (closest poles matter most)
    dmin = np.min(np.abs(poles[:, None] - ds[None, :]), axis=1)
    return poles[np.argsort(dmin)]


def _nep_newton_step(nep: "NEP", lam: complex, x: np.ndarray):
    """One residual-inverse Newton step + Rayleigh-functional update."""
    Tl = nep.T(lam)
    try:
        if nep.n <= 2048:
            dx = np.linalg.solve(np.asarray(Tl.to_dense()).astype(complex),
                                 np.asarray(Tl.mult(jnp.asarray(x))))
        else:
            dx = np.asarray(KSP(Tl, method="direct").solve(
                Tl.mult(jnp.asarray(x))))
    except Exception:
        return lam, x
    x2 = x - dx
    nx = np.linalg.norm(x2)
    if nx < 1e-300:
        return lam, x
    x2 = x2 / nx
    lam2 = _rayleigh_functional(nep, lam, jnp.asarray(x2))
    return complex(lam2), x2


def _smallest_pencil_eig(Tl: LinearOperator, Tp: LinearOperator,
                         deflate: Sequence[np.ndarray]):
    """Smallest-|mu| eigenpair of T y = mu T' y (dense small, host for
    round-1 robustness; EPS sinvert for large n)."""
    n = Tl.shape[0]
    if n <= 2048:
        import scipy.linalg as sla

        Td = np.asarray(Tl.to_dense())
        Jd = np.asarray(Tp.to_dense())
        mu, Y = sla.eig(Td, Jd)
        finite = np.isfinite(mu)
        mu, Y = mu[finite], Y[:, finite]
        j = int(np.argmin(np.abs(mu)))
        y = Y[:, j]
        return complex(mu[j]), jnp.asarray(y / np.linalg.norm(y))
    eps = EPS(Tl, Tp, problem_type=ProblemType.GNHEP, nev=1,
              which=Which.TARGET_MAGNITUDE, target=0.0)
    eps.solve()
    mu, y = eps.get_eigenpair(0)
    return complex(mu), jnp.asarray(y)


def _rayleigh_functional(nep: NEP, lam: complex, x, maxit: int = 20) -> complex:
    """Newton on g(z) = x^H T(z) x = 0 near lam (the Rayleigh functional)."""
    z = lam
    for _ in range(maxit):
        g = complex(jnp.vdot(x, nep.T(z).mult(x)))
        gp = complex(jnp.vdot(x, nep.Tprime(z).mult(x)))
        if abs(gp) < 1e-300:
            break
        dz = g / gp
        z = z - dz
        if abs(dz) < 1e-14 * max(1.0, abs(z)):
            break
    return z


def _nep_left_vector(nep: "NEP", lam: complex, x: np.ndarray) -> np.ndarray:
    """Left eigenvector y: y^H T(lam) = 0, via inverse iteration on
    T(lam)^H (reference: NEP two-sided support, nepimpl.h twosided)."""
    n = nep.n
    Td = np.asarray(nep.T(lam).to_dense()).astype(complex)
    rng = np.random.default_rng(7)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y /= np.linalg.norm(y)
    M = Td.conj().T + 1e-13 * np.eye(n)  # tiny regularization at the root
    for _ in range(5):
        try:
            y = np.linalg.solve(M, y)
        except np.linalg.LinAlgError:
            break
        y /= np.linalg.norm(y)
    return y


def _attach_two_sided(nep: "NEP") -> None:
    """Compute left eigenvectors for all converged pairs."""
    if nep.nconv == 0 or nep.n > 4096:
        nep._left_eigenvectors = None
        return
    Y = np.zeros((nep.n, nep.nconv), dtype=complex)
    for i in range(nep.nconv):
        Y[:, i] = _nep_left_vector(nep, complex(nep.eigenvalues[i]),
                                   nep._eigenvectors[:, i])
    nep._left_eigenvectors = Y
