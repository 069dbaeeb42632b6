"""EPS subspace iteration with Rayleigh-Ritz.

Reference: src/eps/impls/subspace/subspace.c (364 LoC): block iteration
V <- Op V, periodic orthonormalization + Rayleigh-Ritz projection, locking
of converged leading pairs.

TPU shape: the block apply is one SpMM, orthonormalization is CholeskyQR2
(one psum), projection one GEMM — every step is MXU-dense.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bv.orthog import cholqr2
from ..ds.schur import schur, schur_eigvectors, sort_schur
from .base import EPS, EPSSolver, ProblemType
from .krylovschur import _pair_keys


class Subspace(EPSSolver):
    def solve(self, eps: EPS) -> None:
        st = eps.st
        op = st.op()
        n, ncv = eps.n, eps.ncv
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)
        hermitian = eps.is_hermitian
        sc = eps.sort_criterion()

        rng = np.random.default_rng(0)
        V = rng.standard_normal((n, ncv))
        if cplx:
            V = V + 1j * rng.standard_normal((n, ncv))
        if eps.initial_space is not None:
            k0 = min(eps.initial_space.shape[1], ncv)
            V[:, :k0] = eps.initial_space[:, :k0]
        Vj = jnp.asarray(V, dtype=dtype)
        Vj, _ = cholqr2(Vj)

        nconv = 0
        lams = np.zeros(ncv, dtype=complex)
        errs = np.full(ncv, np.inf)

        while eps.its < eps.max_it:
            eps.its += 1
            W = op.mult(Vj[:, nconv:])  # converged columns stay fixed
            Vj = Vj.at[:, nconv:].set(W)
            Vj, _ = cholqr2(Vj)
            # Rayleigh-Ritz
            AV = op.mult(Vj)
            G = np.asarray(Vj.conj().T @ AV)
            if hermitian:
                theta, Q = np.linalg.eigh(0.5 * (G + G.conj().T))
                keys = sc.keys(st.back_transform(theta.astype(complex)))
                order = np.argsort(keys, kind="stable")
                theta, Q = theta[order].astype(complex), Q[:, order]
            else:
                T, Q, theta = schur(G)
                keys = sc.keys(st.back_transform(theta))
                if not cplx:
                    keys = _pair_keys(T, keys)
                T, Q, theta = sort_schur(T, Q, keys)
            Vj = Vj @ jnp.asarray(Q, dtype=dtype)
            # residuals of leading pairs
            AV = op.mult(Vj)
            R = AV - Vj @ jnp.asarray(
                np.diag(theta).real if not cplx else np.diag(theta), dtype=dtype) \
                if hermitian else None
            if hermitian:
                rn = np.asarray(jnp.linalg.norm(R, axis=0))
            else:
                G2 = np.asarray(Vj.conj().T @ AV)
                Rfull = np.asarray(AV) - np.asarray(Vj) @ np.triu(G2)
                rn = np.linalg.norm(Rfull, axis=0)
            errs = np.array([eps.conv_measure(theta[i], rn[i]) for i in range(ncv)])
            k2 = 0
            while k2 < ncv and errs[k2] < eps.tol:
                k2 += 1
            nconv = k2
            lams = st.back_transform(theta)
            eps.monitor(eps, eps.its, nconv, lams, errs)
            if nconv >= eps.nev:
                break

        eps.nconv = nconv
        eps.eigenvalues = lams[:nconv].copy()
        if np.all(np.abs(np.imag(eps.eigenvalues)) < 1e-14):
            eps.eigenvalues = eps.eigenvalues.real
        eps.errests = errs[:nconv].copy()
        if hermitian or cplx:
            eps._eigenvectors = np.asarray(Vj[:, :nconv])
        else:
            # extract eigenvectors from the leading Schur block
            G = np.asarray(Vj.conj().T @ op.mult(Vj))
            w, Y = np.linalg.eig(G[:max(nconv, 1), :max(nconv, 1)])
            keys = sc.keys(st.back_transform(w))
            order = np.argsort(keys, kind="stable")
            Y = Y[:, order[:nconv]]
            X = np.asarray(Vj[:, :max(nconv, 1)]) @ Y
            nrm = np.linalg.norm(X, axis=0)
            nrm[nrm == 0] = 1
            eps._eigenvectors = X / nrm
            eps.eigenvalues = st.back_transform(w[order[:nconv]])


EPS.register("subspace", Subspace)
