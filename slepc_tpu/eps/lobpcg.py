"""EPS LOBPCG — locally optimal block preconditioned conjugate gradient.

Reference: src/eps/impls/cg/lobpcg/lobpcg.c (699 LoC): blocked iteration on
[X, W, P] with Rayleigh-Ritz, preconditioner from STPRECOND, soft locking.

Stability: W and P are B-orthonormalized *blockwise* against the previous
blocks with rank truncation (dropping near-dependent directions) before the
Rayleigh-Ritz — the standard robust formulation; without it the trial Gram
matrix goes singular and the iteration stagnates.

TPU shape: the iteration is three SpMMs + small Gram eighs + GEMMs —
dense, MXU-friendly, one psum per Gram matrix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..st.st import STPrecond
from .base import EPS, EPSSolver


def _b_orthonormalize(S, BS, drop_tol=1e-8):
    """B-orthonormalize columns of S (given BS = B S) with truncation.

    Returns (S', BS', ncols_kept); columns spanning near-null Gram
    directions are dropped.
    """
    G = np.asarray(S.conj().T @ BS)
    G = 0.5 * (G + G.conj().T)
    lam, U = np.linalg.eigh(G)
    keep = lam > drop_tol * max(lam[-1], 1e-300)
    if not np.any(keep):
        return None, None, 0
    T = U[:, keep] / np.sqrt(lam[keep])[None, :]
    Tj = jnp.asarray(T, dtype=S.dtype)
    return S @ Tj, BS @ Tj, int(keep.sum())


class LOBPCG(EPSSolver):
    def solve(self, eps: EPS) -> None:
        if not eps.is_hermitian:
            raise ValueError("lobpcg requires a Hermitian problem type")
        st = eps.st
        A, B = eps.A, eps.B
        n = eps.n
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)
        bs = min(max(eps.nev, 1), getattr(eps, "lobpcg_blocksize", max(eps.nev, 4)))
        largest = eps.which.value.startswith("largest")
        sgn = -1.0 if largest else 1.0

        precond = st.preconditioner() if isinstance(st, STPrecond) else (lambda r: r)
        Bmult = (lambda v: B.mult(v)) if B is not None else (lambda v: v)

        rng = np.random.default_rng(0)
        X = rng.standard_normal((n, bs))
        if cplx:
            X = X + 1j * rng.standard_normal((n, bs))
        if eps.initial_space is not None:
            k0 = min(eps.initial_space.shape[1], bs)
            X[:, :k0] = eps.initial_space[:, :k0]
        Xj = jnp.asarray(X, dtype=dtype)
        Xj, BX, _ = _b_orthonormalize(Xj, Bmult(Xj))
        P = BP = None

        theta = np.zeros(bs)
        errs = np.full(bs, np.inf)
        nconv = 0
        while eps.its < eps.max_it:
            eps.its += 1
            AX = A.mult(Xj)
            G = np.asarray(Xj.conj().T @ AX)
            theta = np.real(np.diagonal(G))
            R = AX - BX * jnp.asarray(theta, dtype=dtype)[None, :]
            rn = np.asarray(jnp.linalg.norm(R, axis=0))
            errs = np.array([eps.conv_measure(theta[i], rn[i]) for i in range(bs)])
            order = np.argsort(sgn * theta, kind="stable")
            nconv = 0
            for i in order:
                if errs[i] < eps.tol:
                    nconv += 1
                else:
                    break
            eps.monitor(eps, eps.its, nconv, theta[order], errs[order])
            if nconv >= eps.nev:
                break

            W = precond(R)
            # W := (I - X X^H B) W, B-orthonormalized with truncation
            W = W - Xj @ (BX.conj().T @ W)
            W, BW, nw = _b_orthonormalize(W, Bmult(W))
            if nw == 0:
                break  # residual space exhausted
            blocks = [Xj, W]
            bblocks = [BX, BW]
            np_cols = 0
            if P is not None:
                Pp = P - Xj @ (BX.conj().T @ P) - W @ (BW.conj().T @ P)
                Pp, BPp, np_cols = _b_orthonormalize(Pp, Bmult(Pp))
                if np_cols:
                    blocks.append(Pp)
                    bblocks.append(BPp)
            Sb = jnp.concatenate(blocks, axis=1)
            ASb = A.mult(Sb)
            Gs = np.asarray(Sb.conj().T @ ASb)
            Gs = 0.5 * (Gs + Gs.conj().T)
            w, C = np.linalg.eigh(sgn * Gs)
            w = sgn * w
            C = jnp.asarray(C[:, :bs], dtype=dtype)
            Xnew = Sb @ C
            Cp = C.at[:bs, :].set(0.0)  # implicit P: W/P components of new X
            P = Sb @ Cp
            BSb = jnp.concatenate(bblocks, axis=1)
            BP = BSb @ Cp
            Xj = Xnew
            BX = BSb @ C

        order = np.argsort(sgn * theta, kind="stable")
        theta, errs = theta[order], errs[order]
        Xnp = np.asarray(Xj)[:, order]
        k = min(nconv, bs)
        eps.nconv = k
        eps.eigenvalues = theta[:k].astype(float)
        eps.errests = errs[:k]
        eps._eigenvectors = Xnp[:, :k]


EPS.register("lobpcg", LOBPCG)
