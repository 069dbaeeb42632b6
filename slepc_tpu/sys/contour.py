"""Shared contour-integral machinery (SlepcContourData analog).

Reference: src/sys/slepccontour.c — the common infrastructure for all CISS
solvers (EPS/PEP/NEP): distribute quadrature points, accumulate moments
S_k = (1/2πi) ∮ z^k F(z)^{-1} G dz · V, rank-revealing basis extraction
(SlepcCISS_BH_SVD :209).  The reference parallelizes points over
subcommunicators; here points run sequentially per factorization (batched
iterative solves are the planned multi-mesh mapping).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def contour_moments(
    solve_at: Callable[[complex, np.ndarray], np.ndarray],
    rhs: np.ndarray,
    z: np.ndarray,
    w: np.ndarray,
    n_moments: int,
) -> np.ndarray:
    """S = [S_0 | ... | S_{M-1}], S_k = sum_j w_j z_j^k solve_at(z_j, rhs).

    ``solve_at(z, R)`` returns F(z)^{-1} R (shape of R).
    """
    n, L = rhs.shape
    M = n_moments
    S = np.zeros((n, M * L), dtype=complex)
    for j in range(len(z)):
        Y = solve_at(z[j], rhs)
        zk = 1.0
        for k in range(M):
            S[:, k * L: (k + 1) * L] += (w[j] * zk) * Y
            zk *= z[j]
    return S


def rank_reveal(S: np.ndarray, tol: float = 1e-11) -> np.ndarray:
    """Orthonormal basis of the numerical range of S (BVSVDAndRank)."""
    Q, sv, _ = np.linalg.svd(S, full_matrices=False)
    rank = int(np.sum(sv > tol * max(sv[0] if sv.size else 0.0, 1e-300)))
    return Q[:, : max(rank, 1)]


def hankel_pencil(S: np.ndarray, L: int, M: int) -> Tuple[np.ndarray, np.ndarray]:
    """Block-Hankel pencil (H0, H1) from moment blocks (the Hankel
    extraction variant, reference ciss.c EPS_CISS_EXTRACTION_HANKEL)."""
    # Mu_k = V^H S_k reduced moments are assumed already formed in S blocks
    m2 = M // 2
    H0 = np.concatenate([S[:, (i) * L: (i + m2) * L] for i in range(m2)], axis=0)
    H1 = np.concatenate([S[:, (i + 1) * L: (i + 1 + m2) * L] for i in range(m2)], axis=0)
    return H0, H1
