"""EPS LyapII — Lyapunov inverse iteration for rightmost eigenvalues.

Reference: src/eps/impls/lyapii/lyapii.c (793 LoC): to find the rightmost
eigenvalues of A (stability analysis), iterate on the Lyapunov operator:
solve A Y + Y A^H + x x^H = 0 (via LME, low-rank), take the dominant
eigenvector(s) of Y as the next iterate; the dominant invariant subspace of
Y aligns with the eigenvectors of the rightmost (least stable) pair.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lme.lme import LME
from .base import EPS, EPSConvergedReason, EPSSolver


class LyapII(EPSSolver):
    rank = 2  # working rank (reference -eps_lyapii_ranks)

    def solve(self, eps: EPS) -> None:
        A = eps.A
        n = eps.n
        dtype = np.dtype(eps.A.dtype)
        if np.issubdtype(dtype, np.complexfloating):
            raise ValueError("lyapii implemented for real operators (reference parity)")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 1))
        x /= np.linalg.norm(x)
        lme = LME(A, ncv=min(30, n), tol=max(eps.tol * 0.01, 1e-12))

        # subspace-accelerated variant: accumulate dominant Lyapunov
        # directions in V (dim <= mmax) and Rayleigh-Ritz on A|V each
        # iteration (the reference's projected EPS inner solve role)
        mmax = max(8, 2 * eps.nev + 2)
        Vsub = x.copy()
        lam = None
        xc = None
        err = np.inf
        C = None
        j = 0
        U = Vsub
        eps.its = 0
        while eps.its < eps.max_it:
            eps.its += 1
            Z = lme.solve(x)  # A (ZZ^T) + (ZZ^T) A^T + x x^T = 0
            if Z.size == 0:
                break
            Unew, s, _ = np.linalg.svd(Z, full_matrices=False)
            add = Unew[:, : self.rank]
            if Vsub.shape[1] + add.shape[1] > mmax and xc is not None:
                # restart the extraction space around the current best pair
                seed = np.column_stack([xc.real, xc.imag]) \
                    if abs(lam.imag) > 1e-13 else xc.real[:, None]
                Vsub = seed
            Vsub = np.concatenate([Vsub, add], axis=1)
            Vsub, _ = np.linalg.qr(Vsub)
            AV = np.asarray(A.mult(jnp.asarray(Vsub, dtype=dtype)))
            G = Vsub.T @ AV
            w, C = np.linalg.eig(G)
            # residuals of ALL Ritz pairs (cheap: AV already available);
            # spurious "rightmost" Ritz values from stale subspace
            # directions must not be selected
            Rmat = AV @ C - (Vsub @ C) * w[None, :]
            res_all = np.linalg.norm(Rmat, axis=0) / np.maximum(np.abs(w), 1e-300)
            feas = res_all < 0.2
            if np.any(feas):
                cand = np.where(feas)[0]
                j = int(cand[np.argmax(w.real[cand])])
            else:
                j = int(np.argmin(res_all))
            lam = w[j]
            xc = Vsub @ C[:, j]
            xc = xc / np.linalg.norm(xc)
            err = res_all[j]
            eps.monitor(eps, eps.its, int(err < eps.tol), np.array([lam]),
                        np.array([err]))
            if err < eps.tol:
                break
            # next iterate: the DOMINANT direction of the Lyapunov solution
            # (inverse iteration on the Lyapunov operator)
            x = Unew[:, :1]

        cplx_pair = lam is not None and abs(lam.imag) > 1e-13
        eps.nconv = (2 if cplx_pair else 1) if (lam is not None and err < eps.tol * 100) else 0
        if eps.nconv:
            if cplx_pair:
                eps.eigenvalues = np.array([lam, np.conj(lam)])
                X = np.column_stack([xc, np.conj(xc)])
                eps._eigenvectors = X / np.linalg.norm(X, axis=0)
                eps.errests = np.array([err, err])
            else:
                eps.eigenvalues = np.array([lam.real])
                xv = xc.real
                eps._eigenvectors = (xv / np.linalg.norm(xv))[:, None]
                eps.errests = np.array([err])
        else:
            eps.eigenvalues = np.array([])
            eps.errests = np.array([])
            eps._eigenvectors = np.zeros((n, 0), dtype=dtype)
            eps.reason = EPSConvergedReason.DIVERGED_ITS


EPS.register("lyapii", LyapII)
