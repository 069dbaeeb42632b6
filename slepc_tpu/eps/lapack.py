"""EPS dense LAPACK fallback (reference: src/eps/impls/lapack/lapack.c).

Materializes the operators and solves the full dense problem — testing and
small-n use, exactly like the reference's redundant dense solver.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from .base import EPS, EPSSolver, ProblemType


class Lapack(EPSSolver):
    def solve(self, eps: EPS) -> None:
        A = np.asarray(eps.A.to_dense())
        B = None if eps.B is None else np.asarray(eps.B.to_dense())
        hermitian = eps.is_hermitian
        if hermitian and B is None:
            w, X = np.linalg.eigh(0.5 * (A + A.conj().T))
            w = w.astype(complex)
        elif hermitian:
            w, X = sla.eigh(0.5 * (A + A.conj().T), 0.5 * (B + B.conj().T))
            w = w.astype(complex)
        elif B is None:
            w, X = np.linalg.eig(A)
        else:
            w, X = sla.eig(A, B)
        sc = eps.sort_criterion()
        finite = np.isfinite(w)
        w, X = w[finite], X[:, finite]
        order = sc.argsort(w)
        w, X = w[order], X[:, order]
        k = min(eps.nev, len(w))
        eps.its = 1
        eps.nconv = k
        eps.eigenvalues = w[:k]
        if np.all(np.abs(np.imag(w[:k])) < 1e-14):
            eps.eigenvalues = w[:k].real
        nrm = np.linalg.norm(X[:, :k], axis=0)
        nrm[nrm == 0] = 1
        eps._eigenvectors = X[:, :k] / nrm
        eps.errests = np.array([eps.compute_error(i) for i in range(k)])


EPS.register("lapack", Lapack)
