"""EPS Davidson-type solvers: GD (generalized Davidson) and JD
(Jacobi-Davidson).

Reference: src/eps/impls/davidson/ (4,335 LoC framework: davidson.c +
dvdcalcpairs/dvdimprovex/dvdupdatev/dvdschm) with thin wrappers gd/gd.c and
jd/jd.c.  The composable sub-scheme structure collapses here into one loop
with a pluggable *improver*:
  GD: expand with the preconditioned residual t = K^-1 r.
  JD: expand with an approximate solution of the projected correction
      equation (I - u u^H)(A - theta B)(I - u u^H) t = -r
      (dvdimprovex.c), solved by a few preconditioned iterations.
Restart keeps the best `minv` Ritz vectors (reference -eps_gd_minv).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bv.orthog import cholqr2
from ..st.st import STPrecond
from ..sys.sort import SortCriterion
from .base import EPS, EPSSolver
from ..ds.schur import schur, sort_schur
from .krylovschur import _pair_keys


class _Davidson(EPSSolver):
    jd_correction = False

    def solve(self, eps: EPS) -> None:
        st = eps.st
        A, B = eps.A, eps.B
        n, ncv = eps.n, eps.ncv
        minv = max(eps.nev, min(6, ncv // 2))
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)
        hermitian = eps.is_hermitian
        sc = eps.sort_criterion()

        precond = (st.preconditioner() if isinstance(st, STPrecond)
                   else (lambda r: r))

        rng = np.random.default_rng(0)
        v0 = rng.standard_normal((n, 1))
        if cplx:
            v0 = v0 + 1j * rng.standard_normal((n, 1))
        if eps.initial_space is not None:
            v0 = eps.initial_space[:, :1]
        Vj = jnp.asarray(v0, dtype=dtype)
        Vj = Vj / jnp.linalg.norm(Vj)

        locked_X: list[np.ndarray] = []
        locked_lam: list[complex] = []
        locked_err: list[float] = []

        while eps.its < eps.max_it and len(locked_lam) < eps.nev:
            eps.its += 1
            m = Vj.shape[1]
            AV = A.mult(Vj)
            BV = B.mult(Vj) if B is not None else Vj
            import scipy.linalg as sla

            if eps.extraction == "harmonic" and eps.target is not None:
                # harmonic Rayleigh-Ritz (reference: the Davidson
                # EPS_HARMONIC route, dvdcalcpairs.c): with
                # W = (A - tau B) V, solve W^H W c = xi W^H B V c;
                # theta = tau + xi selects interior pairs reliably
                tau = complex(eps.target)
                Wv = AV - tau * BV
                G1 = np.asarray(Wv.conj().T @ Wv)
                M1 = np.asarray(Wv.conj().T @ BV)
                xi, C = sla.eig(G1, M1)
                fin = np.isfinite(xi)
                xi, C = xi[fin], C[:, fin]
                w = tau + xi
            else:
                G = np.asarray(Vj.conj().T @ AV)
                M = np.asarray(Vj.conj().T @ BV)
                if hermitian:
                    w, C = sla.eigh(0.5 * (G + G.conj().T),
                                    0.5 * (M + M.conj().T))
                    w = w.astype(complex)
                else:
                    w, C = sla.eig(G, M)
            keys = sc.keys(w)
            order = np.argsort(keys, kind="stable")
            w, C = w[order], C[:, order]
            theta = w[0]
            u = Vj @ jnp.asarray(C[:, 0], dtype=dtype)
            u = u / jnp.linalg.norm(u)
            Au = A.mult(u)
            Bu = B.mult(u) if B is not None else u
            theta = complex(jnp.vdot(u, Au) / jnp.vdot(u, Bu))
            if hermitian and not cplx:
                theta = theta.real
            r = Au - theta * Bu
            rn = float(jnp.linalg.norm(r))
            err = eps.conv_measure(theta, rn)
            eps.monitor(eps, eps.its, len(locked_lam),
                        np.concatenate([np.asarray(locked_lam, complex), w[:1]]),
                        np.concatenate([locked_err, [err]]))

            if err < eps.tol:
                locked_X.append(np.asarray(u))
                locked_lam.append(theta)
                locked_err.append(err)
                # deflate: remove u from V, continue with next Ritz vector
                keep = min(minv, m - 1) if m > 1 else 1
                Ck = jnp.asarray(C[:, 1: keep + 1], dtype=dtype) if m > 1 else None
                if Ck is not None and Ck.shape[1] > 0:
                    Vj = Vj @ Ck
                else:
                    v = jnp.asarray(rng.standard_normal(n), dtype=dtype)
                    Vj = v[:, None]
                Vj = _deflate_block(Vj, locked_X)
                Vj, _ = cholqr2(Vj)
                continue

            # --- improver ---
            if self.jd_correction:
                t = _jd_correct(A, B, u, theta, r, precond, dtype)
            else:
                t = precond(r)
            t = _deflate_block(t[:, None] if t.ndim == 1 else t, locked_X)[:, 0]
            # orthogonalize against V
            t = t - Vj @ (Vj.conj().T @ t)
            t = t - Vj @ (Vj.conj().T @ t)
            tn = jnp.linalg.norm(t)
            if float(tn) < 1e-13:
                t = jnp.asarray(rng.standard_normal(n), dtype=dtype)
                t = t - Vj @ (Vj.conj().T @ t)
                tn = jnp.linalg.norm(t)
            t = t / tn

            if m >= ncv:  # restart: keep best minv Ritz vectors
                Ck = jnp.asarray(C[:, :minv], dtype=dtype)
                Vj = Vj @ Ck
                Vj, _ = cholqr2(Vj)
            Vj = jnp.concatenate([Vj, t[:, None]], axis=1)

        k = len(locked_lam)
        eps.nconv = k
        eps.eigenvalues = np.array(locked_lam, dtype=complex)
        if k and np.all(np.abs(np.imag(eps.eigenvalues)) < 1e-14):
            eps.eigenvalues = eps.eigenvalues.real
        eps.errests = np.array(locked_err)
        eps._eigenvectors = (np.stack(locked_X, axis=1) if locked_X
                             else np.zeros((n, 0), dtype=dtype))


def _deflate_block(V, locked):
    for x in locked:
        xj = jnp.asarray(x)
        V = V - xj[:, None] @ (xj.conj()[None, :] @ V)
    return V


def _jd_correct(A, B, u, theta, r, precond, dtype, iters: int = 8):
    """Approximate JD correction: preconditioned projected iterations on
    (I - u u^H)(A - theta B)(I - u u^H) t = -r  (dvdimprovex.c role)."""

    def proj(v):
        return v - u * jnp.vdot(u, v)

    def op(v):
        v = proj(v)
        Av = A.mult(v)
        Bv = B.mult(v) if B is not None else v
        return proj(Av - theta * Bv)

    # preconditioned steepest-descent/MINRES-ish loop (robust, matrix-free)
    t = jnp.zeros_like(r)
    res = -r
    for _ in range(iters):
        z = proj(jnp.asarray(precond(res)))
        Az = op(z)
        denom = jnp.vdot(Az, Az)
        alpha = jnp.where(jnp.abs(denom) > 1e-300, jnp.vdot(Az, res) / denom, 0.0)
        t = t + alpha * z
        res = res - alpha * Az
    return t


class GD(_Davidson):
    """Generalized Davidson (reference gd/gd.c)."""

    jd_correction = False


class JD(_Davidson):
    """Jacobi-Davidson (reference jd/jd.c)."""

    jd_correction = True


EPS.register("gd", GD)
EPS.register("jd", JD)
