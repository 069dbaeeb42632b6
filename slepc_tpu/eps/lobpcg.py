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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jacobi_eigh import eigh_small
from ..st.st import STPrecond
from .base import EPS, EPSSolver


@partial(jax.jit, static_argnames=("bs", "k_iters", "largest"))
def lobpcg_cycle(op, X, P, bs: int, k_iters: int, largest: bool):
    """k_iters fused LOBPCG iterations in ONE XLA program — the latency
    fix for the per-iteration host round-trips (at ~1 ms relay dispatch
    the host-orchestrated loop is latency-bound; reference lobpcg.c runs
    per-rank anyway).  Unpreconditioned standard problem; SVQB
    B-orthonormalization (branch-free clamping) instead of truncation so
    all shapes stay static.  Returns (X, P, theta, resid)."""
    rdtype = jnp.zeros((), X.dtype).real.dtype
    eps_mach = jnp.finfo(rdtype).eps
    sgn = -1.0 if largest else 1.0

    def svqb(S):
        """SVQB with NULL-DIRECTION masking: rank-deficient blocks (P on
        the first iteration, W at convergence) get their null columns
        zeroed and flagged, and the Rayleigh-Ritz pushes them to the end
        with a Gram-diagonal penalty — the static-shape substitute for
        the truncation a host loop would do.  Returns (Q, good_mask)."""
        G = S.conj().T @ S
        G = 0.5 * (G + G.conj().T)
        lam, U = eigh_small(G)
        good = lam > eps_mach * jnp.maximum(lam[-1], eps_mach)
        lam_c = jnp.where(good, lam, 1.0)
        T = (U * (good * lam_c ** -0.5)[None, :]).astype(S.dtype)
        return S @ T, good.astype(rdtype)

    penalty = jnp.asarray(1.0 / eps_mach, rdtype) ** 1.5

    def body(i, state):
        X, P = state
        AX = op.mult(X)
        G = X.conj().T @ AX
        R = AX - X @ G  # full projected residual (X orthonormal)
        W, gw = svqb(R - X @ (X.conj().T @ R))
        Pp, gp = svqb(P - X @ (X.conj().T @ P) - W @ (W.conj().T @ P))
        S = jnp.concatenate([X, W, Pp], axis=1)
        AS = op.mult(S)
        Gs = S.conj().T @ AS
        Gs = 0.5 * (Gs + Gs.conj().T)
        pen = jnp.concatenate([jnp.zeros(bs, rdtype), 1.0 - gw, 1.0 - gp])
        M = sgn * Gs + jnp.diag(pen * penalty).astype(Gs.dtype)
        w, C = eigh_small(M)
        C = C[:, :bs].astype(X.dtype)
        Xn = S @ C
        Pn = S @ C.at[:bs, :].set(0.0)
        # re-orthonormalize X (SVQB keeps it well-conditioned)
        Xn, _ = svqb(Xn)
        return Xn, Pn

    X, P = jax.lax.fori_loop(0, k_iters, body, (X, P))
    # Ritz-rotate for reporting: theta ascending/descending per `largest`
    AX = op.mult(X)
    G = X.conj().T @ AX
    G = 0.5 * (G + G.conj().T)
    w, C = eigh_small(sgn * G)
    theta = sgn * w
    C = C.astype(X.dtype)
    X = X @ C
    R = AX @ C - X * theta[None, :].astype(X.dtype)
    resid = jnp.linalg.norm(R, axis=0)
    return X, P, theta, resid


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

        # fused fast path: standard problem, no preconditioner — run
        # chunks of jitted iterations, host-check convergence per chunk
        from ..mat.linop import AIJOperator, DenseOperator, DIAOperator

        if (B is None and not isinstance(st, STPrecond)
                and isinstance(A, (AIJOperator, DenseOperator, DIAOperator))):
            chunk = int(getattr(eps, "lobpcg_chunk", 8) or 8)
            Pj = jnp.zeros_like(Xj)
            while eps.its < eps.max_it:
                eps.its += chunk
                Xj, Pj, th, rn = lobpcg_cycle(A, Xj, Pj, bs=bs,
                                              k_iters=chunk, largest=largest)
                theta = np.asarray(th, dtype=float)
                rn = np.asarray(rn)
                errs = np.array([eps.conv_measure(theta[i], rn[i])
                                 for i in range(bs)])
                nconv = 0
                for i in range(bs):
                    if errs[i] < eps.tol:
                        nconv += 1
                    else:
                        break
                eps.monitor(eps, eps.its, nconv, theta, errs)
                if nconv >= eps.nev:
                    break
            k = min(nconv, bs)
            eps.nconv = k
            eps.eigenvalues = theta[:k].astype(float)
            eps.errests = errs[:k]
            eps._eigenvectors = np.asarray(Xj)[:, :k]
            return

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
