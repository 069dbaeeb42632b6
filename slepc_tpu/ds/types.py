"""DS — dense projected solvers, one class per problem structure.

The reference's DS tier (src/sys/classes/ds/, ~18k LoC of LAPACK drivers)
solves the small (ncv x ncv) projected problem each outer iteration:
HEP/NHEP/GHEP/GHIEP/GNHEP/NHEPTS/SVD/HSVD/GSVD/PEP/NEP.  Here each type is
a small host-side class over numpy/LAPACK (scipy), executed redundantly by
every process — bit-identical by construction, which is what the
reference's DSSynchronize broadcast exists to enforce
(impls/hep/dshep.c:673-711).

API shape (functional, not the reference's RAW->CONDENSED state machine):
``solve`` takes the projected data and returns (eigs, transforms);
reordering takes explicit sort keys from a SortCriterion.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import scipy.linalg as sla

from . import schur as _schur


class DS:
    """Base: registry + common helpers."""

    registry = {}

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        name = cls.__name__.lower().replace("ds", "", 1)
        DS.registry[name] = cls

    @staticmethod
    def create(name: str) -> "DS":
        return DS.registry[name.lower()]()


class DSHEP(DS):
    """Hermitian eigenproblem: full diagonalization of the projected H.

    Reference: impls/hep/dshep.c (steqr/stedc on tridiagonal+arrow).  The
    projected matrix from a full-reorth Lanczos/thick-restart is dense
    symmetric here; eigh is exact and the Schur form is diagonal, so
    'truncate'/'sort' are column selections.
    """

    def solve(self, H: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        H = np.asarray(H)
        w, Q = np.linalg.eigh(0.5 * (H + H.conj().T))
        return w, Q

    def solve_tridiag(self, alpha: np.ndarray, beta: np.ndarray):
        """Tridiagonal fast path (steqr analog)."""
        # divide-and-conquer driver for large projected problems: the
        # reference ships a custom block-tridiagonal D&C (BDC,
        # impls/hep/bdc/dsbtdc.c, 2,610 LoC) because its nev>=500 default
        # sets mpd=500 (epssetup.c:654-678); here the same role is filled
        # by LAPACK's D&C (stevd) — measured 452 -> 45 ms at ncv=2000,
        # 91 -> 17 ms at ncv=1000 vs the default driver
        w, Q = sla.eigh_tridiagonal(alpha, beta,
                                    lapack_driver="stevd"
                                    if len(alpha) >= 256 else "auto")
        return w, Q

    def solve_block_tridiag(self, Ds, Es, tau: float = 0.0,
                            force: bool = False):
        """Symmetric block-tridiagonal projected problem (diag blocks Ds,
        subdiagonal blocks Es) — the blocked-Lanczos DS shape.

        Routes to the own block D&C with deflation (`ds/bdc.py`, the
        dsbtdc.c role) when its regime applies — low coupling rank after
        ``tau`` truncation, where sequential rank-one merges with
        LAED-style deflation beat a dense eigh — and to dense eigh
        otherwise (LAPACK dsyevd is the faster driver for full-rank
        couplings; the reference BDC makes the same trade through its
        tol parameter).  ``force=True`` always takes the D&C path.
        """
        from .bdc import bdc_eig, block_tridiag_dense

        if force or tau > 0.0:
            return bdc_eig(Ds, Es, tau=tau)
        return np.linalg.eigh(block_tridiag_dense(Ds, Es))

    def sort(self, w, Q, keys):
        perm = np.argsort(np.asarray(keys), kind="stable")
        return w[perm], Q[:, perm]


class DSNHEP(DS):
    """Non-Hermitian: Hessenberg -> (real/complex) Schur.

    Reference: impls/nhep/dsnhep.c (gehrd/hseqr/trexc/trevc).
    """

    def solve(self, H: np.ndarray):
        return _schur.schur(H)  # (T, Q, eigs)

    def sort(self, T, Q, keys):
        return _schur.sort_schur(T, Q, keys)

    def vectors(self, T, Q):
        return _schur.schur_eigvectors(T, Q)  # (eigs, X)


class DSNHEPTS(DS):
    """NHEP with left eigenvectors (two-sided).

    Reference: impls/nhepts/dsnhepts.c.  Right pairs from Schur of A, left
    from Schur of A^H, matched by eigenvalue.
    """

    def solve(self, A: np.ndarray):
        T, Q, eigs = _schur.schur(A)
        w, X = _schur.schur_eigvectors(T, Q)
        Tl, Ql, _ = _schur.schur(np.asarray(A).conj().T)
        wl, Y = _schur.schur_eigvectors(Tl, Ql)
        # match left vectors to right eigenvalues
        used = np.zeros(len(wl), bool)
        Ym = np.zeros_like(Y)
        for i, lam in enumerate(w):
            d = np.abs(wl - np.conj(lam)) + np.where(used, np.inf, 0.0)
            j = int(np.argmin(d))
            used[j] = True
            Ym[:, i] = Y[:, j]
        return w, X, Ym


class DSGHEP(DS):
    """Generalized Hermitian (A, B) with B > 0: sygvd analog."""

    def solve(self, A: np.ndarray, B: np.ndarray):
        w, X = sla.eigh(0.5 * (A + A.conj().T), 0.5 * (B + B.conj().T))
        return w, X  # X^H B X = I


def _hz_hyperbolic_jacobi(T: np.ndarray, omega: np.ndarray,
                          max_sweeps: int = 30, tol: float = 1e-14):
    """Structure-preserving HZ-role iteration for the real symmetric /
    signature pencil (T, Omega), Omega = diag(+-1).

    One-sided trigonometric-hyperbolic Jacobi (Veselic; the role of the
    reference's HZ iteration, impls/ghiep/hz.c): accumulate an
    Omega-orthogonal G (G^T Omega G = Omega) with G^T T G diagonal —
    same-sign index pairs use Givens rotations, opposite-sign pairs use
    hyperbolic rotations.  The pencil's signature is preserved EXACTLY
    and eigenvectors come out Omega-orthonormal, which the general eig
    route cannot guarantee for heavily indefinite pencils.

    Requires T DEFINITE (the definite-type/hyperbolic GHIEP regime):
    then every hyperbolic pivot satisfies |2 T_ij| < T_ii + T_jj and the
    sweep converges quadratically; indefinite T (possible complex pairs)
    aborts with converged=False and the caller falls back to general eig.
    Returns (w, G, converged): w real eigenvalues (T g = w Omega g).
    """
    A = np.array(T, dtype=float, copy=True)
    n = A.shape[0]
    om = np.asarray(omega).real
    G = np.eye(n)
    nrm0 = max(np.linalg.norm(A, "fro"), 1e-300)
    for _ in range(max_sweeps):
        off = np.sqrt(max(np.linalg.norm(A, "fro") ** 2
                          - np.linalg.norm(np.diag(A)) ** 2, 0.0))
        if off <= tol * nrm0:
            w = np.diag(A) * om  # T g = w Omega g  with  g^T T g = diag
            return w, G, True
        for i in range(n - 1):
            for j in range(i + 1, n):
                aij = A[i, j]
                if abs(aij) <= 1e-30:
                    continue
                aii, ajj = A[i, i], A[j, j]
                if om[i] == om[j]:
                    # trigonometric: standard symmetric Jacobi rotation
                    tau = (ajj - aii) / (2.0 * aij)
                    t = np.sign(tau) / (abs(tau) + np.hypot(1.0, tau)) \
                        if tau != 0 else 1.0
                    c = 1.0 / np.sqrt(1.0 + t * t)
                    s = t * c
                    R = np.array([[c, s], [-s, c]])
                else:
                    # hyperbolic: annihilate via [[ch, sh], [sh, ch]]
                    # (Omega-orthogonal for opposite signs); requires
                    # |2 aij| < |aii + ajj| (tanh(2y) = -2aij/(aii+ajj))
                    den = aii + ajj
                    if abs(2.0 * aij) >= abs(den):
                        return np.diag(A) * om, G, False
                    th2 = -2.0 * aij / den
                    t = th2 / (1.0 + np.sqrt(1.0 - th2 * th2))  # tanh(y)
                    ch = 1.0 / np.sqrt(1.0 - t * t)
                    sh = t * ch
                    R = np.array([[ch, sh], [sh, ch]])
                idx = [i, j]
                A[idx, :] = R.T @ A[idx, :]
                A[:, idx] = A[:, idx] @ R
                G[:, idx] = G[:, idx] @ R
    off = np.sqrt(max(np.linalg.norm(A, "fro") ** 2
                      - np.linalg.norm(np.diag(A)) ** 2, 0.0))
    return np.diag(A) * om, G, off <= 1e-8 * nrm0


class DSGHIEP(DS):
    """Generalized Hermitian-indefinite: T x = lambda Omega x with
    Omega = diag(+-1) (pseudo-Lanczos projected problem).

    Reference: impls/ghiep/ (HZ/HR iterations, hz.c).  Real pencils with
    a real spectrum solve by the structure-preserving hyperbolic Jacobi
    (:func:`_hz_hyperbolic_jacobi` — Omega-orthogonal congruence, exact
    signature preservation, Omega-orthonormal eigenvectors); pencils
    with complex pairs (hyperbolic pivot breakdown) fall back to the
    general eig route with Omega-normalization.
    """

    def solve(self, T: np.ndarray, omega: np.ndarray):
        T = np.asarray(T)
        omega = np.asarray(omega).real
        if not np.iscomplexobj(T):
            Ts = 0.5 * (T + T.T)
            if np.allclose(T, Ts, rtol=1e-12, atol=1e-14):
                # J-Jacobi scope: T definite (either sign) — then every
                # hyperbolic pivot is valid (aii+ajj >= 2 sqrt(aii ajj)
                # > 2|aij|) and convergence is classical (Veselic); this
                # is the definite-type/hyperbolic GHIEP regime the
                # reference's HZ serves in pseudo-Lanczos restarts
                sgn = 0
                try:
                    np.linalg.cholesky(Ts + 1e-14 * np.eye(len(Ts)))
                    sgn = 1
                except np.linalg.LinAlgError:
                    try:
                        np.linalg.cholesky(-Ts + 1e-14 * np.eye(len(Ts)))
                        sgn = -1
                    except np.linalg.LinAlgError:
                        sgn = 0
                if sgn:
                    w, G, ok = _hz_hyperbolic_jacobi(sgn * Ts, omega)
                    if ok:
                        # columns satisfy g^T Omega g = +-1 by construction
                        w = sgn * w
                        order = np.argsort(w)
                        return w[order], G[:, order]
        M = omega[:, None] * T  # Omega T
        w, X = np.linalg.eig(M)
        # Omega-normalize: x^H Omega x = +-1 where possible
        for j in range(X.shape[1]):
            s = np.real(X[:, j].conj() @ (omega * X[:, j]))
            if abs(s) > np.finfo(float).eps:
                X[:, j] /= np.sqrt(abs(s))
        # real-ify nearly-real eigenpairs
        if np.all(np.abs(w.imag) <= 1e-12 * (1 + np.abs(w.real))):
            w = w.real
            X = X.real if not np.iscomplexobj(T) else X
        return w, X


class DSGNHEP(DS):
    """Generalized non-Hermitian via QZ (gges/tgexc analog)."""

    def solve(self, A: np.ndarray, B: np.ndarray,
              keys_fn: Optional[Callable] = None):
        if keys_fn is None:
            keys_fn = lambda ev: -np.abs(ev)
        S, T, Q, Z, eigs = _schur.ordered_qz(np.asarray(A), np.asarray(B), keys_fn)
        return S, T, Q, Z, eigs

    def vectors(self, S, T, Q, Z):
        """Right eigenvectors of (A,B) from QZ: X = Z Y."""
        lam, Y = sla.eig(S, T)
        X = Z @ Y
        nrm = np.linalg.norm(X, axis=0)
        nrm[nrm == 0] = 1
        return lam, X / nrm


class DSSVD(DS):
    """(Bi)diagonal/dense SVD of the projected matrix (gesdd analog)."""

    def solve(self, Bmat: np.ndarray):
        U, s, Vh = np.linalg.svd(np.asarray(Bmat), full_matrices=False)
        return U, s, Vh

    def solve_bidiag(self, alpha: np.ndarray, beta: np.ndarray):
        """Upper-bidiagonal [alpha; superdiag beta] SVD."""
        m = len(alpha)
        B = np.diag(alpha).astype(float)
        for i in range(m - 1):
            B[i, i + 1] = beta[i]
        return self.solve(B)


class DSHSVD(DS):
    """Hyperbolic SVD: A = U Sigma V^H with U^H Omega U = Omega-hat.

    Reference: impls/hsvd/dshsvd.c.  Functional route: eigendecompose
    A^H Omega A (Hermitian, possibly indefinite); sigma = sqrt|lambda|,
    signature from sign(lambda).
    """

    def solve(self, A: np.ndarray, omega: np.ndarray):
        A = np.asarray(A)
        omega = np.asarray(omega).real
        M = A.conj().T @ (omega[:, None] * A)
        lam, V = np.linalg.eigh(0.5 * (M + M.conj().T))
        # descending by |lambda|
        order = np.argsort(-np.abs(lam), kind="stable")
        lam, V = lam[order], V[:, order]
        sigma = np.sqrt(np.abs(lam))
        signs = np.where(lam >= 0, 1.0, -1.0)
        U = np.zeros((A.shape[0], len(sigma)), dtype=A.dtype)
        for j in range(len(sigma)):
            if sigma[j] > 1e-300:
                U[:, j] = A @ V[:, j] / (signs[j] * sigma[j])
        return U, sigma, V.conj().T, signs


class DSGSVD(DS):
    """Generalized SVD of the pair (A, B): A = U C X^-1, B = V S X^-1.

    Reference: impls/gsvd/dsgsvd.c (ggsvd-style).  Functional route via the
    eigen-pencil (A^H A, B^H B) — adequate for the projected sizes used by
    the TRLanczos GSVD driver.
    """

    def solve(self, A: np.ndarray, B: np.ndarray):
        A, B = np.asarray(A), np.asarray(B)
        GA = A.conj().T @ A
        GB = B.conj().T @ B
        # regularize B-gram for the pencil solve
        lam, X = sla.eigh(0.5 * (GA + GA.conj().T),
                          0.5 * (GB + GB.conj().T) + 1e-14 * np.eye(GB.shape[0]))
        order = np.argsort(-lam, kind="stable")
        lam, X = lam[order], X[:, order]
        sigma = np.sqrt(np.maximum(lam, 0.0))  # sigma = c/s
        U = A @ X
        V = B @ X
        for M in (U, V):
            nrm = np.linalg.norm(M, axis=0)
            nrm[nrm == 0] = 1
            M /= nrm
        return U, sigma, V, X


class DSPEP(DS):
    """Polynomial eigenproblem P(lambda) = sum_i lambda^i E_i on the
    projected matrices — solved on the companion linearization
    (reference: impls/pep/dspep.c, QZ on the d*ld linearization)."""

    def solve(self, coeffs: Sequence[np.ndarray]):
        coeffs = [np.asarray(c) for c in coeffs]
        d = len(coeffs) - 1
        k = coeffs[0].shape[0]
        dt = np.result_type(*[c.dtype for c in coeffs])
        # companion pencil (A0 + lambda B0) of size d*k
        A = np.zeros((d * k, d * k), dtype=dt)
        B = np.eye(d * k, dtype=dt)
        for i in range(d - 1):
            A[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k] = np.eye(k)
        for i in range(d):
            A[(d - 1) * k :, i * k : (i + 1) * k] = -coeffs[i]
        B[(d - 1) * k :, (d - 1) * k :] = coeffs[d]
        lam, X = sla.eig(A, B)
        # eigenvectors of P: leading k block, normalized
        Xp = X[:k, :]
        nrm = np.linalg.norm(Xp, axis=0)
        nrm[nrm == 0] = 1
        return lam, Xp / nrm


class DSNEP(DS):
    """Projected nonlinear eigenproblem T(lambda) y = 0.

    Reference: impls/nep/dsnep.c (contour-integral / successive linear
    inner solves on the projected split form).  ``solve`` takes a callable
    evaluating the projected T(lambda) (k x k) and a contour/region, and
    runs a Beyn-style contour integral on the dense projected problem.
    """

    def solve_contour(self, Tfun: Callable[[complex], np.ndarray], center: complex,
                      radius: float, npoints: int = 32, rank_tol: float = 1e-12):
        """Beyn contour integral on the projected problem.

        Quadrature parallelism: the reference's dsnep.c distributes the
        contour points over MPI ranks (5 MPI sites); the same
        data-parallel shape here is one BATCHED (npoints, k, k) solve —
        every point factors in a single LAPACK/XLA batched call instead
        of a sequential per-point loop."""
        k = Tfun(center).shape[0]
        rng = np.random.default_rng(0)
        Vrand = rng.standard_normal((k, k)) + 1j * rng.standard_normal((k, k))
        theta = 2 * np.pi * np.arange(npoints) / npoints
        zs = center + radius * np.exp(1j * theta)
        ws = radius * np.exp(1j * theta) / npoints  # dz/(2*pi*i) weight
        Ts = np.stack([Tfun(z) for z in zs])  # user callback stays serial
        Tz = np.linalg.solve(Ts, np.broadcast_to(Vrand, Ts.shape))
        A0 = np.einsum("p,pij->ij", ws, Tz)
        A1 = np.einsum("p,pij->ij", ws * zs, Tz)
        U, s, Vh = np.linalg.svd(A0)
        r = int(np.sum(s > rank_tol * max(s[0], 1e-300)))
        if r == 0:
            return np.array([]), np.zeros((k, 0), dtype=complex)
        U1, s1, V1h = U[:, :r], s[:r], Vh[:r, :]
        Bm = U1.conj().T @ A1 @ V1h.conj().T @ np.diag(1.0 / s1)
        lam, Y = np.linalg.eig(Bm)
        X = U1 @ Y
        nrm = np.linalg.norm(X, axis=0)
        nrm[nrm == 0] = 1
        return lam, X / nrm

    def solve_slp(self, Tfun: Callable, Jfun: Callable, lam0: complex,
                  maxit: int = 50, tol: float = 1e-12):
        """Successive-linear-problems on the projected dense problem."""
        lam = lam0
        k = Tfun(lam0).shape[0]
        x = np.ones(k) / np.sqrt(k)
        for _ in range(maxit):
            T = Tfun(lam)
            J = Jfun(lam)
            mu, X = sla.eig(T, J)
            j = int(np.argmin(np.abs(mu)))
            lam = lam - mu[j]
            x = X[:, j] / np.linalg.norm(X[:, j])
            if abs(mu[j]) < tol * max(abs(lam), 1.0):
                break
        return lam, x
