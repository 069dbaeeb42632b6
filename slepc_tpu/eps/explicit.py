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

        while eps.its < eps.max_it and k < nev:
            eps.its += 1
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
