"""Thick-restart Golub–Kahan–Lanczos bidiagonalization.

Reference: src/svd/impls/trlanczos/trlanczos.c (2,337 LoC): two-sided GK
recurrence — per step one SpMV with A and one with A^H, each followed by
(re)orthogonalization — with thick restarts keeping the best Ritz triplets.

TPU design: the whole block extension is one jitted lax.fori_loop
(gk_extend); full CGS2 reorthogonalization makes the harvested projected
matrix B = U^H A V exact including the restart arrow columns, so the host
tier just SVDs the small active block each outer iteration (DSSVD role).
Residual estimate: beta * |last component of left singular vector| (the GK
relation A^H U = V B^H + beta v_res e_m^T).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def gk_extend(A, U, V, Bmat, k, m, key=None):
    """Extend a GK factorization from k to m columns.

    U: (mrows, mmax) left basis; V: (ncols, mmax+1) right basis with column
    k the current start vector; Bmat: (mmax, mmax) projected U^H A V.
    Returns (U, V, Bmat, beta_m).
    """
    mmax = Bmat.shape[0]
    rdtype = jnp.zeros((), V.dtype).real.dtype

    def body(j, state):
        U, V, Bmat, _ = state
        v = V[:, j]
        # left vector: u = A v, orthogonalize against U[:, :j]
        u = A.mult(v)
        masku = (jnp.arange(U.shape[1]) < j).astype(rdtype)
        c1 = (U.conj().T @ u) * masku
        u = u - U @ c1
        c2 = (U.conj().T @ u) * masku
        u = u - U @ c2
        alpha = jnp.linalg.norm(u)
        safe_a = jnp.where(alpha > 0, alpha, 1.0)
        U = U.at[:, j].set(u / safe_a)
        col = (c1 + c2).at[j].set(alpha.astype(V.dtype))
        Bmat = Bmat.at[:, j].set(col)
        # right vector: w = A^H u_j, orthogonalize against V[:, :j+1]
        w = A.mult_h(U[:, j])
        maskv = (jnp.arange(V.shape[1]) < j + 1).astype(rdtype)
        d1 = (V.conj().T @ w) * maskv
        w = w - V @ d1
        d2 = (V.conj().T @ w) * maskv
        w = w - V @ d2
        beta = jnp.linalg.norm(w)
        safe_b = jnp.where(beta > 0, beta, 1.0)
        V = V.at[:, j + 1].set(w / safe_b)
        return U, V, Bmat, beta

    beta0 = jnp.zeros((), rdtype)
    U, V, Bmat, beta = jax.lax.fori_loop(k, m, body, (U, V, Bmat, beta0))
    return U, V, Bmat, beta


def trlanczos_solve(svd) -> None:
    """Driver implementing the thick-restart loop on the SVD object."""
    A = svd.A
    mrows, ncols = A.shape
    dtype = np.dtype(A.dtype)
    nsv = svd.nsv
    ncv = svd.ncv or min(min(mrows, ncols), max(2 * nsv, nsv + 15))
    ncv = min(ncv, min(mrows, ncols))
    tol = svd.tol if svd.tol is not None else (1e-8 if dtype.itemsize >= 8 else 1e-5)
    max_it = svd.max_it or max(100, 2 * min(mrows, ncols) // ncv)
    largest = getattr(svd.which, "value", "largest") == "largest"

    rng = np.random.default_rng(0)
    v0 = rng.standard_normal(ncols)
    if np.issubdtype(dtype, np.complexfloating):
        v0 = v0 + 1j * rng.standard_normal(ncols)
    v0 = v0 / np.linalg.norm(v0)

    U = jnp.zeros((mrows, ncv), dtype=dtype)
    V = jnp.zeros((ncols, ncv + 1), dtype=dtype)
    V = V.at[:, 0].set(jnp.asarray(v0, dtype=dtype))
    Bmat = jnp.zeros((ncv, ncv), dtype=dtype)

    k = 0
    l = 0
    sig_locked = np.zeros(ncv)
    err_locked = np.zeros(ncv)
    svd.its = 0

    while svd.its < max_it:
        svd.its += 1
        m = ncv
        U, V, Bmat, beta_j = gk_extend(A, U, V, Bmat, k + l, m)
        beta = float(beta_j)
        Bh = np.asarray(Bmat)
        S = Bh[k:m, k:m]
        P, sig, Qh = np.linalg.svd(S)
        Q = Qh.conj().T
        if not largest:
            P, sig, Q = P[:, ::-1], sig[::-1], Q[:, ::-1]
        # residual estimates: beta * |last row of P|
        resid = beta * np.abs(P[-1, :])
        errest = resid / np.where(sig > 1e-300, sig, 1.0)

        k2 = k
        while k2 < m and errest[k2 - k] < tol:
            k2 += 1
        done = k2 >= nsv or svd.its >= max_it
        l = 0 if done else max(1, int(0.5 * (m - k2)))
        l = min(l, max(m - k2 - 1, 0)) if not done else 0
        kl = (k2 - k) + l

        for i in range(k2 - k):
            sig_locked[k + i] = sig[i]
            err_locked[k + i] = errest[i]

        if kl > 0:
            Pk = jnp.asarray(P[:, :kl], dtype=dtype)
            Qk = jnp.asarray(Q[:, :kl], dtype=dtype)
            Unew = U[:, k:m] @ Pk
            Vnew = V[:, k:m] @ Qk
            U = U.at[:, k: k + kl].set(Unew)
            V = V.at[:, k: k + kl].set(Vnew)
            Bh2 = np.zeros_like(Bh)
            Bh2[:k, :k] = Bh[:k, :k] * 0
            for i in range(k):
                Bh2[i, i] = sig_locked[i]
            for i in range(kl):
                Bh2[k + i, k + i] = sig[i]
            Bmat = jnp.asarray(Bh2, dtype=dtype)
            if not done:
                vres = V[:, m]
                V = V.at[:, k2 + l].set(vres)
        k = k2
        if done:
            break

    svd.nconv = min(k, nsv) if k >= nsv else k
    kk = k
    svd.sigma = sig_locked[:kk].copy()
    svd.U = np.array(U[:, :kk], copy=True)
    svd.V = np.array(V[:, :kk], copy=True)
    svd._renormalize()
    # re-pair: ensure u_i = A v_i / sigma exactly (improves pairing after
    # the final rotation)
    if kk:
        AV = np.asarray(A.mult(jnp.asarray(svd.V, dtype=dtype)))
        denom = np.where(svd.sigma > 1e-300, svd.sigma, 1.0)
        Upair = AV / denom
        nrm = np.linalg.norm(Upair, axis=0)
        good = nrm > 0.5  # only replace when A v has meaningful norm
        svd.U[:, good] = (Upair[:, good] / nrm[good])
    order = np.argsort(-svd.sigma) if largest else np.argsort(svd.sigma)
    svd.sigma = svd.sigma[order]
    svd.U = svd.U[:, order]
    svd.V = svd.V[:, order]
    svd.errests = err_locked[:kk][order]


def gsvd_jbd_solve(svd) -> None:
    """GSVD of (A, B) via joint bidiagonalization of Z = [A; B].

    Reference: SVDSolve_TRLanczos_GSVD and SVDLanczosGUpper
    (src/svd/impls/trlanczos/trlanczos.c:994-1223): the Krylov basis V
    lives in the STACKED space R^{m+p} and stays orthonormal; its top and
    bottom blocks factor through separate orthonormal bases U1, U2 as
    top(V) = U1 R1, bottom(V) = U2 R2.  Because V, U1, U2 are orthonormal,
    [R1; R2] has orthonormal columns, so the projected problem is a CS
    decomposition (R1 = U C W^H, R2 = Vm S W^H with W unitary) — solved
    here from the SVD of R1 (no cross-product squaring).  Each extension
    step pulls back to the right space with one least-squares solve
    Z x = [u1; 0] through the normal equations (the reference's inner
    KSP, trlanczos.c:59-65).  Coefficients are fully harvested into
    R1/R2, so restarts need no extra-row bookkeeping: the projected pair
    is exact in the RAW dense state.

    Unlike the cross-pencil route (svd.py _solve_gsvd_cross), conditioning
    depends on kappa(Z), not kappa(Z)^2.
    """
    A, B = svd.A, svd.B
    m, n = A.shape
    p = B.shape[0]
    dtype = np.dtype(np.result_type(A.dtype, B.dtype))
    nsv = svd.nsv
    ncv = svd.ncv or min(n, max(2 * nsv, nsv + 15))
    ncv = min(ncv, n)
    tol = svd.tol if svd.tol is not None else (
        1e-8 if dtype.itemsize >= 8 else 1e-5)
    max_it = svd.max_it or max(100, 2 * n // max(ncv, 1))
    largest = getattr(svd.which, "value", "largest") == "largest"

    from ..ksp import KSP
    from ..mat.linop import ShellOperator

    # least-squares pullback x = Z^+ [u; 0] via the normal equations
    try:
        import scipy.sparse as sp

        As, Bs = A.to_scipy(), B.to_scipy()
        NE = As.conj().T @ As + Bs.conj().T @ Bs
        if sp.issparse(NE):
            from ..mat.linop import AIJOperator

            neop = AIJOperator.from_scipy(sp.csr_matrix(NE))
        else:
            from ..mat.linop import DenseOperator

            neop = DenseOperator(np.asarray(NE))
        ksp = KSP(neop, method="direct", hermitian=True)
    except Exception:
        def ne_mult(x):
            return A.mult_h(A.mult(x)) + B.mult_h(B.mult(x))

        neop = ShellOperator((n, n), dtype, ne_mult, ne_mult)
        ksp = KSP(neop, method="cg", hermitian=True, rtol=1e-13)

    def pull_back(u1):
        return np.asarray(ksp.solve(jnp.asarray(A.mult_h(jnp.asarray(
            u1, dtype=dtype)))))

    def zmult(x):
        xj = jnp.asarray(x, dtype=dtype)
        return np.concatenate([np.asarray(A.mult(xj)), np.asarray(B.mult(xj))])

    U1 = np.zeros((m, ncv), dtype=dtype)
    U2 = np.zeros((p, ncv), dtype=dtype)
    Vst = np.zeros((m + p, ncv + 1), dtype=dtype)
    R1 = np.zeros((ncv, ncv), dtype=dtype)
    R2 = np.zeros((ncv, ncv), dtype=dtype)

    # x-space representatives: Vst[:, j] = Z @ Xr[:, j] BY CONSTRUCTION.
    # Without this, tiny out-of-range components of V get re-amplified by
    # 1/beta at every orthogonalization step (beta ~ 0.2 means 5x per
    # column) and destroy the y <-> x correspondence within a few sweeps.
    Xr = np.zeros((n, ncv + 1), dtype=dtype)
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal(m)
    if np.issubdtype(dtype, np.complexfloating):
        u0 = u0 + 1j * rng.standard_normal(m)
    x0 = pull_back(u0)
    w0 = zmult(x0)
    n0 = np.linalg.norm(w0)
    Vst[:, 0] = w0 / n0
    Xr[:, 0] = x0 / n0

    def cgs2(Q, ncols, w):
        """w -> (w - Q c, c) with 2-pass CGS against Q[:, :ncols]."""
        if ncols == 0:
            return w, np.zeros(0, dtype=dtype)
        Qc = Q[:, :ncols]
        c1 = Qc.conj().T @ w
        w = w - Qc @ c1
        c2 = Qc.conj().T @ w
        w = w - Qc @ c2
        return w, c1 + c2

    # soft locking (like the jitted KS cycle): converged triplets stay in
    # the leading columns of the full window and keep being rotated — the
    # CS decomposition reproduces them as (nearly) unit vectors, so no
    # locked/active split is needed and U1/U2 stay orthonormal under the
    # full-window rotation.
    kl = 0
    k2 = 0
    cvals = svals = None
    errest = np.zeros(ncv)
    svd.its = 0
    nrmA = A.norm_estimate()
    nrmB = B.norm_estimate()

    def pull_back_stacked(vy):
        return np.asarray(ksp.solve(jnp.asarray(
            A.mult_h(jnp.asarray(vy[:m], dtype=dtype))
            + B.mult_h(jnp.asarray(vy[m:], dtype=dtype)))))

    while svd.its < max_it:
        svd.its += 1
        # ---- joint bidiagonalization extension (harvested RAW) ----
        for j in range(kl, ncv):
            a, ca = cgs2(U1, j, Vst[:m, j].copy())
            alpha = np.linalg.norm(a)
            b, cb = cgs2(U2, j, Vst[m:, j].copy())
            alphah = np.linalg.norm(b)
            if alpha < 1e-14 or alphah < 1e-14:
                # breakdown: new random in-range direction
                xr = pull_back(rng.standard_normal(m))
                rnd = zmult(xr)
                rnd, cr = cgs2(Vst, j, rnd)
                xr = xr - Xr[:, :j] @ cr
                nr = np.linalg.norm(rnd)
                if nr < 1e-14:
                    break
                Vst[:, j] = rnd / nr
                Xr[:, j] = xr / nr
                a, ca = cgs2(U1, j, Vst[:m, j].copy())
                alpha = np.linalg.norm(a)
                b, cb = cgs2(U2, j, Vst[m:, j].copy())
                alphah = np.linalg.norm(b)
            U1[:, j] = a / alpha if alpha > 0 else a
            U2[:, j] = b / alphah if alphah > 0 else b
            R1[:j, j] = ca
            R1[j, j] = alpha
            R2[:j, j] = cb
            R2[j, j] = alphah
            # next stacked vector: least-squares pullback of [u1_j; 0]
            xw = pull_back(U1[:, j])
            w = zmult(xw)
            w, cw = cgs2(Vst, j + 1, w)
            xw = xw - Xr[:, :j + 1] @ cw
            beta = np.linalg.norm(w)
            if beta < 1e-14:
                xw = pull_back(rng.standard_normal(m))
                w = zmult(xw)
                w, cw = cgs2(Vst, j + 1, w)
                xw = xw - Xr[:, :j + 1] @ cw
                beta = np.linalg.norm(w)
            xw = xw / beta
            # REFRESH from the x-representative: roundoff from the CGS
            # subtraction leaves range(Z) and would be re-amplified by
            # 1/beta at every subsequent step (beta ~ 0.2 makes that 5x
            # per column); rebuilding v = Z x pins the column to range(Z)
            # at fresh-eps level.  One light CGS pass restores the ~eps
            # orthogonality the refresh perturbs.
            w = zmult(xw)
            w2, cw2 = cgs2(Vst, j + 1, w)
            nn = np.linalg.norm(w2)
            Vst[:, j + 1] = w2 / nn
            Xr[:, j + 1] = (xw - Xr[:, :j + 1] @ cw2) / nn
            beta_last = beta

        # ---- projected CS decomposition of [R1; R2] (full window) ----
        Uc, cvals, Wh = np.linalg.svd(R1)
        W = Wh.conj().T  # unitary
        order = np.argsort(-cvals) if largest else np.argsort(cvals)
        cvals = cvals[order]
        Uc = Uc[:, order]
        W = W[:, order]
        RW = R2 @ W
        svals = np.linalg.norm(RW, axis=0)
        sigma = cvals / np.where(svals > 1e-300, svals, 1e-300)

        # ---- convergence: subspace residual estimate (reference
        # SVDKrylovConvergence style).  A candidate's pencil residual
        # leaks into the un-processed vector v_ncv only through the
        # pullback of u1_{ncv-1}, so the estimate is the U-side rotation's
        # last-row weight times the next-step norm — scale-free and
        # immune to the kappa(Z)^2 floor an explicit pencil residual has
        errest = beta_last * np.abs(Uc[ncv - 1, :]) / np.maximum(
            np.abs(cvals), 1e-30)
        k2 = 0
        while k2 < ncv and errest[k2] < tol:
            k2 += 1
        done = k2 >= nsv or svd.its >= max_it

        kl = k2 + max(1, (ncv - k2) // 2)
        kl = min(kl, ncv - 1)
        if done:
            break

        # ---- full-window rotation (restart compaction; W unitary) ----
        Vst[:, :ncv] = Vst[:, :ncv] @ W
        Xr[:, :ncv] = Xr[:, :ncv] @ W
        U1[:, :ncv] = U1[:, :ncv] @ Uc
        Vm = RW / np.where(svals > 1e-300, svals, 1e-300)
        U2[:, :ncv] = U2[:, :ncv] @ Vm
        R1 = np.diag(cvals).astype(dtype)
        R2 = np.diag(svals).astype(dtype)
        vres = Vst[:, ncv].copy()
        xres = Xr[:, ncv].copy()
        vres, cr = cgs2(Vst, kl, vres)
        xres = xres - Xr[:, :kl] @ cr
        nv_ = np.linalg.norm(vres)
        if nv_ > 1e-14:
            Vst[:, kl] = vres / nv_
            Xr[:, kl] = xres / nv_
        else:
            xr = pull_back(rng.standard_normal(m))
            rnd = zmult(xr)
            rnd, cr = cgs2(Vst, kl, rnd)
            xr = xr - Xr[:, :kl] @ cr
            nr = np.linalg.norm(rnd)
            Vst[:, kl] = rnd / nr
            Xr[:, kl] = xr / nr

    kk = min(k2, ncv)
    svd.nconv = kk
    # final quantities from the last CS decomposition (not yet rotated in
    # when the loop exits via done)
    sig = cvals[:kk] / np.where(svals[:kk] > 1e-300, svals[:kk], 1e-300)
    svd.sigma = sig
    svd.U = (U1[:, :ncv] @ Uc[:, :kk])
    Vm = RW[:, :kk] / np.where(svals[:kk] > 1e-300, svals[:kk], 1e-300)
    svd.V = (U2[:, :ncv] @ Vm)
    svd.X = Xr[:, :ncv] @ W[:, :kk]
    svd.errests = errest[:kk].copy()
