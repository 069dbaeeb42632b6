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
