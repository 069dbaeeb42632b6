"""Coupled two-sided Krylov-Schur (BiKS).

Reference: src/eps/impls/krylov/krylovschur/ks-twosided.c
(EPSSolve_KrylovSchur_TwoSided): two Arnoldi factorizations advance
together — V for Op and W for Op^H — and are coupled through the oblique
interaction matrix M = W^H V:

  * after each extension, the next right vector is made obliquely
    orthogonal to the LEFT basis (v <- v - V M^{-1} W^H v) and vice versa
    (EPSTwoSidedRQUpdate1); the corrections fold into the last columns of
    the two Rayleigh quotients, so the projected pair (S, T) stays an
    exact representation,
  * the projected pair is solved as two Schur forms with CONSISTENTLY
    matched eigenvalue order (DSNHEPTS role),
  * thick restart rotates BOTH bases (Q for V, Z for W) and both
    residual vectors are re-orthonormalized with their coefficients
    folded back into the arrow rows (EPSTwoSidedRQUpdate2).

Convergence requires BOTH the right and the left residual estimates
below tolerance (EPSKrylovConvergence with betat).

TPU mapping: extensions are the jitted Arnoldi loops (bv/krylov.py) on
Op and its adjoint; the coupling solves are ncv x ncv host LAPACK.
Internally complex-always (real conjugate-pair Schur bookkeeping is not
worth its cost at projected sizes; SURVEY.md 'real-arithmetic conjugate
pairs' note).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bv.krylov import extend_dispatch
from ..ds.schur import schur, sort_schur
from ..mat.linop import AdjointOperator
from .base import EPS, EPSConvergedReason


def twosided_solve(eps: EPS) -> None:
    st = eps.st
    op = st.op()
    opH = AdjointOperator(op)
    n, ncv, nev, mpd = eps.n, eps.ncv, eps.nev, eps.mpd
    dtype = np.complex128
    sc = eps.sort_criterion()

    rng = np.random.default_rng(0)
    v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    w0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    if eps.initial_space is not None:
        v0 = np.asarray(eps.initial_space[:, 0]).astype(complex)
    V = jnp.zeros((n, ncv + 1), dtype=dtype).at[:, 0].set(
        jnp.asarray(v0 / np.linalg.norm(v0)))
    W = jnp.zeros((n, ncv + 1), dtype=dtype).at[:, 0].set(
        jnp.asarray(w0 / np.linalg.norm(w0)))
    S = jnp.zeros((ncv + 1, ncv), dtype=dtype)
    T = jnp.zeros((ncv + 1, ncv), dtype=dtype)

    k = 0
    l = 0
    eigs_locked = np.zeros(ncv, dtype=complex)
    err_locked = np.zeros(ncv)
    Slock = np.zeros((ncv, ncv), dtype=complex)
    eps.its = 0

    while eps.its < eps.max_it:
        eps.its += 1
        nv = min(k + mpd, ncv)

        # ---- extend both factorizations (jitted hot loops) ----
        V, S, beta_j, brkv, _ = extend_dispatch(op, V, S, k + l, nv)
        W, T, betat_j, brkw, _ = extend_dispatch(opH, W, T, k + l, nv)
        beta = float(jnp.abs(beta_j))
        betat = float(jnp.abs(betat_j))
        brk = bool(brkv) or bool(brkw)

        Sh = np.array(S, dtype=complex)
        Th = np.array(T, dtype=complex)
        Vn = np.array(V)
        Wn = np.array(W)

        # ---- oblique coupling (EPSTwoSidedRQUpdate1) ----
        M = Wn[:, :nv].conj().T @ Vn[:, :nv]
        try:
            wv = np.linalg.solve(M, Wn[:, :nv].conj().T @ Vn[:, nv])
            ww = np.linalg.solve(M.conj().T, Vn[:, :nv].conj().T @ Wn[:, nv])
        except np.linalg.LinAlgError:
            eps.reason = EPSConvergedReason.DIVERGED_BREAKDOWN
            break
        vres = Vn[:, nv] - Vn[:, :nv] @ wv
        wres = Wn[:, nv] - Wn[:, :nv] @ ww
        Sh[:nv, nv - 1] += beta * wv
        Th[:nv, nv - 1] += betat * ww
        vnorm = np.linalg.norm(vres)
        wnorm = np.linalg.norm(wres)

        # ---- projected two-sided solve (DSNHEPTS role) ----
        Sa = Sh[k:nv, k:nv]
        Ta = Th[k:nv, k:nv]
        TS, Q, theta = schur(Sa)
        lam_approx = st.back_transform(theta)
        keys = sc.keys(lam_approx)
        TS, Q, theta = sort_schur(TS, Q, keys)
        lam_approx = st.back_transform(theta)
        # left Schur ordered to MATCH the right eigenvalues (theta_T ~
        # conj(theta_S)); keys = rank of the matched right value
        TT, Z, thetl = schur(Ta)
        na = nv - k
        used = np.zeros(na, bool)
        rank = np.zeros(na)
        for i in range(na):
            d = np.abs(thetl - np.conj(theta[i])) + np.where(used, np.inf, 0)
            j = int(np.argmin(d))
            used[j] = True
            rank[j] = i
        TT, Z, thetl = sort_schur(TT, Z, rank)

        # ---- convergence: BOTH residual estimates (max) ----
        lastS = Q[na - 1, :]
        lastT = Z[na - 1, :]
        residr = beta * vnorm * np.abs(lastS)
        residl = betat * wnorm * np.abs(lastT)
        resid = np.maximum(residr, residl)
        errest = np.array([eps.conv_measure(theta[i], resid[i])
                           for i in range(na)])
        if eps.rg is not None:
            outside = eps.rg.check_inside(lam_approx) < 0
            errest = np.where(outside, np.inf, errest)

        k2 = k
        while k2 < nv and errest[k2 - k] < eps.tol:
            k2 += 1
        eps.nconv = k2
        all_eigs = np.concatenate([eigs_locked[:k], lam_approx])
        all_err = np.concatenate([err_locked[:k], errest])
        eps.monitor(eps, eps.its, k2, all_eigs, all_err)

        done = k2 >= nev or eps.its >= eps.max_it
        if eps.stopping is not None:
            done = eps.stopping(eps, eps.its, k2, nev) or done

        l = 0 if done else max(1, int(0.5 * (nv - k2)))
        l = min(l, max(nv - k2 - 1, 0)) if not done else 0
        kl = (k2 - k) + l

        for i in range(k2 - k):
            eigs_locked[k + i] = lam_approx[i]
            err_locked[k + i] = errest[i]
        Slock[k:k2, k:k2] = TS[: k2 - k, : k2 - k]
        Slock[:k, k:k2] = Sh[:k, k:nv] @ Q[:, : k2 - k]

        if kl > 0:
            # ---- rotate both bases ----
            Vn[:, k:k + kl] = Vn[:, k:nv] @ Q[:, :kl]
            Wn[:, k:k + kl] = Wn[:, k:nv] @ Z[:, :kl]

            Sh2 = np.zeros_like(Sh)
            Th2 = np.zeros_like(Th)
            Sh2[:k2, :k2] = Slock[:k2, :k2]
            Th2[:k2, :k2] = np.diag(np.conj(np.diag(Slock))[:k2])
            if not done and l > 0:
                Sh2[k2:k2 + l, k2:k2 + l] = TS[k2 - k:kl, k2 - k:kl]
                Sh2[k:k2, k2:k2 + l] = TS[:k2 - k, k2 - k:kl]
                Sh2[:k, k2:k2 + l] = Sh[:k, k:nv] @ Q[:, k2 - k:kl]
                Th2[k2:k2 + l, k2:k2 + l] = TT[k2 - k:kl, k2 - k:kl]
                Th2[k:k2, k2:k2 + l] = TT[:k2 - k, k2 - k:kl]
                Th2[:k, k2:k2 + l] = Th[:k, k:nv] @ Z[:, k2 - k:kl]
                # arrow rows from the oblique residual vectors
                Sh2[k2 + l, k2:k2 + l] = beta * lastS[k2 - k:kl]
                Th2[k2 + l, k2:k2 + l] = betat * lastT[k2 - k:kl]

            if not done:
                # ---- residual columns + re-orthonormalization
                # (EPSTwoSidedRQUpdate2): coefficients fold into arrows ----
                cV = Vn[:, :k2 + l].conj().T @ vres
                vres2 = vres - Vn[:, :k2 + l] @ cV
                nrm = np.linalg.norm(vres2)
                if nrm < 1e-300:
                    brk = True
                else:
                    Vn[:, k2 + l] = vres2 / nrm
                    Sh2[:k2 + l, k2:k2 + l] += np.outer(
                        cV, Sh2[k2 + l, k2:k2 + l])
                    Sh2[k2 + l, k2:k2 + l] *= nrm
                cW = Wn[:, :k2 + l].conj().T @ wres
                wres2 = wres - Wn[:, :k2 + l] @ cW
                nrmw = np.linalg.norm(wres2)
                if nrmw < 1e-300:
                    brk = True
                else:
                    Wn[:, k2 + l] = wres2 / nrmw
                    Th2[:k2 + l, k2:k2 + l] += np.outer(
                        cW, Th2[k2 + l, k2:k2 + l])
                    Th2[k2 + l, k2:k2 + l] *= nrmw
            V = jnp.asarray(Vn)
            W = jnp.asarray(Wn)
            S = jnp.asarray(Sh2)
            T = jnp.asarray(Th2)
        k = k2
        if done:
            break
        if brk:
            # restart both factorizations from fresh random directions
            rv = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            rw = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            Vn = np.array(V)
            Wn = np.array(W)
            rv -= Vn[:, :k] @ (Vn[:, :k].conj().T @ rv)
            rw -= Wn[:, :k] @ (Wn[:, :k].conj().T @ rw)
            if np.linalg.norm(rv) < 1e-300 or np.linalg.norm(rw) < 1e-300:
                eps.reason = EPSConvergedReason.DIVERGED_BREAKDOWN
                break
            V = V.at[:, k].set(jnp.asarray(rv / np.linalg.norm(rv)))
            W = W.at[:, k].set(jnp.asarray(rw / np.linalg.norm(rw)))
            l = 0

    # ---- finalize: eigenpairs from the locked Schur block ----
    eps.nconv = k
    Vn = np.array(V)
    Wn = np.array(W)
    if k > 0:
        Tb = Slock[:k, :k]
        wv, Y = np.linalg.eig(Tb)
        lam = st.back_transform(wv)
        X = Vn[:, :k] @ Y
        X /= np.maximum(np.linalg.norm(X, axis=0), 1e-300)
        # left vectors: match locked left basis through the adjoint
        # projected problem
        Mk = Wn[:, :k].conj().T @ Vn[:, :k]
        # y_i spans W; solve (Y^H M)^H coefficients for biorthogonality:
        # YL = W * (M^{-H} Y^{-H})  =>  YL^H A X diagonal
        try:
            C = np.linalg.solve(Mk.conj().T, np.linalg.inv(Y).conj().T)
            YL = Wn[:, :k] @ C
            YL /= np.maximum(np.linalg.norm(YL, axis=0), 1e-300)
        except np.linalg.LinAlgError:
            YL = Wn[:, :k]
        eps.eigenvalues = np.asarray(lam)
        eps._eigenvectors = X
        eps._left_eigenvectors = YL
        eps.errests = err_locked[:k].copy()
    else:
        eps.eigenvalues = np.zeros(0, dtype=complex)
        eps._eigenvectors = np.zeros((n, 0), dtype=complex)
        eps._left_eigenvectors = np.zeros((n, 0), dtype=complex)
        eps.errests = np.zeros(0)
    eps.V = None
