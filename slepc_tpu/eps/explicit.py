"""EPS explicitly-restarted Arnoldi and Lanczos.

Reference: src/eps/impls/krylov/arnoldi/arnoldi.c (explicit restart with
locking) and src/eps/impls/krylov/lanczos/lanczos.c (reorthogonalization
modes; here full reorth — the numerically robust mode — is the only one,
since the fused-reduction CGS2 kernel makes full reorth nearly free on
TPU relative to the SpMV).

Both share the jitted extension kernel; the restart uses the leading Ritz
vector (no thick restart — that is krylovschur's job).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bv.bv import BV
from ..bv.krylov import extend_dispatch
from ..ds.schur import schur, schur_eigvectors, sort_schur
from .base import EPS, EPSSolver
from .krylovschur import _pair_keys


def _lanczos_run_host(op, Varr, kstart: int, m: int, nc: int, mode: str,
                      period: int, nsel_max: int):
    """Host-orchestrated Lanczos run with the reference's light
    reorthogonalization modes (lanczos.c EPSLanczosReorthogType):

      local     — bare 3-term recurrence (+ orth against locked columns);
      selective — Parlett-Scott: additionally, when a Ritz pair of the
                  running tridiagonal becomes nearly converged
                  (beta |s_mi| < sqrt(eps) ||T||), its Ritz vector is
                  FORMED ONCE and every later Lanczos vector is
                  orthogonalized against it — orthogonality degrades
                  precisely along converged Ritz directions, so this
                  restores semi-orthogonality at O(#converged) extra
                  vectors of traffic;
      periodic  — a full CGS2 sweep every `period` columns.

    Returns (Varr, H, beta, breakdown).
    """
    import jax.numpy as jnp

    dtype = Varr.dtype
    rdt = np.zeros((), dtype).real.dtype
    sqeps = float(np.sqrt(np.finfo(rdt).eps))
    n = Varr.shape[0]
    H = np.zeros((m + 1, m), dtype=dtype)
    sel: list = []  # formed Ritz vectors (Parlett-Scott)
    sel_vals: list = []
    alphas: list = []
    betas: list = []
    base = Varr[:, : nc + kstart] if nc + kstart > 0 else None
    beta = 0.0
    for j in range(kstart, m):
        v = Varr[:, nc + j]
        w = op.mult(v)
        if j > kstart:
            w = w - betas[-1] * Varr[:, nc + j - 1]
        alpha = float(jnp.vdot(v, w).real)
        w = w - alpha * v
        alphas.append(alpha)
        # locked columns + deflation constraints: always (CGS x2)
        if base is not None:
            for _ in range(2):
                w = w - base @ (base.conj().T @ w)
        if mode == "selective" and sel:
            Smat = jnp.stack(sel, axis=1)
            for _ in range(2):
                w = w - Smat @ (Smat.conj().T @ w)
        if mode == "periodic" and (j - kstart) % max(period, 1) == max(period, 1) - 1:
            act = Varr[:, nc: nc + j + 1]
            for _ in range(2):
                w = w - act @ (act.conj().T @ w)
        beta = float(jnp.linalg.norm(w))
        nrm_T = max([abs(a) for a in alphas] + betas + [1e-300])
        if beta < 1e-12 * nrm_T:
            H[kstart + len(alphas), kstart + len(alphas) - 1] = 0.0
            for i, a in enumerate(alphas):
                H[kstart + i, kstart + i] = a
            for i, b in enumerate(betas):
                H[kstart + i + 1, kstart + i] = b
                H[kstart + i, kstart + i + 1] = b
            return Varr, jnp.asarray(H), 0.0, True
        Varr = Varr.at[:, nc + j + 1].set(w / beta)
        if mode == "selective" and len(alphas) >= 2 and len(sel) < nsel_max:
            import scipy.linalg as sla

            th, S = sla.eigh_tridiagonal(np.asarray(alphas),
                                         np.asarray(betas))
            bounds = beta * np.abs(S[-1, :])
            for i in np.argsort(bounds):
                if bounds[i] >= sqeps * nrm_T or len(sel) >= nsel_max:
                    break
                if any(abs(th[i] - tv) < 1e-8 * nrm_T for tv in sel_vals):
                    continue
                y = Varr[:, nc + kstart: nc + j + 1] @ jnp.asarray(
                    S[:, i], dtype=dtype)
                y = y / jnp.linalg.norm(y)
                sel.append(y)
                sel_vals.append(th[i])
        betas.append(beta)
    betas = betas[:-1]
    for i, a in enumerate(alphas):
        H[kstart + i, kstart + i] = a
    for i, b in enumerate(betas):
        H[kstart + i + 1, kstart + i] = b
        H[kstart + i, kstart + i + 1] = b
    H[m, m - 1] = beta
    return Varr, jnp.asarray(H), beta, False


class _ExplicitRestartKrylov(EPSSolver):
    hermitian_only = False

    def solve(self, eps: EPS) -> None:
        st = eps.st
        op = st.op()
        n, ncv, nev = eps.n, eps.ncv, eps.nev
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)
        hermitian = eps.is_hermitian or self.hermitian_only
        sc = eps.sort_criterion()
        Bip = eps.B if (eps.problem_type.value in ("ghep",) and eps.B is not None) else None

        V = BV(n, ncv + 1, dtype)
        if Bip is not None:
            V.set_matrix(Bip)
        nc = 0
        if eps.deflation_space is not None:
            nc = V.insert_constraints(jnp.asarray(eps.deflation_space, dtype=dtype))
        rng = np.random.default_rng(0)
        v0 = rng.standard_normal(n)
        if cplx:
            v0 = v0 + 1j * rng.standard_normal(n)
        if eps.initial_space is not None:
            v0 = np.asarray(eps.initial_space[:, 0])
        V.set_column(0, jnp.asarray(v0, dtype=dtype))
        V.orthonormalize_column(0, replace_lindep=True)

        k = 0  # locked
        lams = np.zeros(ncv, dtype=complex)
        errs = np.zeros(ncv)
        X_locked = []

        rmode = getattr(eps, "reorth", "full")
        use_light = (hermitian and Bip is None
                     and rmode in ("local", "selective", "periodic"))

        while eps.its < eps.max_it and k < nev:
            eps.its += 1
            if use_light:
                V.array, H, beta_j, brk = _lanczos_run_host(
                    op, V.array, k, ncv, nc, rmode,
                    int(getattr(eps, "reorth_period", 4) or 4),
                    nsel_max=nev + 4)
            else:
                H = jnp.zeros((ncv + 1, ncv), dtype=dtype)
                V.array, H, beta_j, brk, _ = extend_dispatch(
                    op, V.array, H, k, ncv, nc=nc, Bop=Bip)
            beta = float(beta_j)
            Hh = np.asarray(H)
            S = Hh[k:ncv, k:ncv]
            na = ncv - k
            if hermitian:
                theta, Q = np.linalg.eigh(0.5 * (S + S.conj().T))
                theta = theta.astype(complex)
                keys = sc.keys(st.back_transform(theta))
                order = np.argsort(keys, kind="stable")
                theta, Q = theta[order], Q[:, order]
                Y = Q
            else:
                T, Q, theta = schur(S)
                keys = sc.keys(st.back_transform(theta))
                if not cplx:
                    keys = _pair_keys(T, keys)
                T, Q, theta = sort_schur(T, Q, keys)
                Y = Q
            resid = beta * np.abs(Y[na - 1, :])
            if not cplx and not hermitian:
                i = 0
                while i < na:
                    if i + 1 < na and T[i + 1, i] != 0.0:
                        r = np.hypot(resid[i], resid[i + 1])
                        resid[i] = resid[i + 1] = r
                        i += 2
                    else:
                        i += 1
            errest = np.array([eps.conv_measure(theta[i], resid[i]) for i in range(na)])

            k2 = k
            while k2 < ncv and errest[k2 - k] < eps.tol:
                k2 += 1
            if not cplx and not hermitian:
                d = k2 - k
                if 0 < d < na and T[d, d - 1] != 0.0:
                    k2 -= 1
            keep = max(k2 - k, 1)  # lock converged; else restart with best Ritz vec
            Qk = jnp.asarray(Q[:, :keep], dtype=dtype)
            Vact = V.array[:, nc + k: nc + ncv]
            Vnew = Vact @ Qk
            V.array = V.array.at[:, nc + k: nc + k + keep].set(Vnew)
            for i in range(k2 - k):
                lams[k + i] = theta[i]
                errs[k + i] = errest[i]
            eps.monitor(eps, eps.its, k2,
                        st.back_transform(np.concatenate([lams[:k], theta])),
                        np.concatenate([errs[:k], errest]))
            if k2 == k:
                # no progress: restart vector = best unconverged Ritz vector
                # (already placed at column k); re-orthonormalize
                V.set_active_columns(0, k + 1)
                V.orthonormalize_column(k, replace_lindep=True)
            k = k2

        eps.nconv = k
        theta_l = lams[:k]
        Vl = np.asarray(V.array[:, nc: nc + k])
        lam = st.back_transform(theta_l)
        eps.eigenvalues = lam
        if np.all(np.abs(np.imag(lam)) < 1e-14):
            eps.eigenvalues = lam.real
        eps.errests = errs[:k].copy()
        eps._eigenvectors = Vl


class Arnoldi(_ExplicitRestartKrylov):
    """Explicitly restarted Arnoldi (reference arnoldi.c)."""


class Lanczos(_ExplicitRestartKrylov):
    """Explicitly restarted Lanczos, full reorthogonalization
    (reference lanczos.c, EPS_LANCZOS_REORTHOG_FULL)."""

    hermitian_only = True


EPS.register("arnoldi", Arnoldi)
EPS.register("lanczos", Lanczos)
