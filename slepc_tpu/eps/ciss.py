"""EPS CISS — contour integral spectral slicing (Sakurai–Sugiura).

Reference: src/eps/impls/ciss/ciss.c (1,474 LoC): quadrature over an RG
contour; subspace from S_k = (1/2πi) ∮ z^k (zB - A)^{-1} B V dz;
Rayleigh-Ritz (or block-Hankel) extraction; per-integration-point linear
solves parallelized over subcommunicators (SlepcContourData,
src/sys/slepccontour.c).

TPU design: the N quadrature solves are independent — the analog of the
reference's subcomm task parallelism is batching them (vmapped iterative
solves or one factorization per point on host); the moment accumulation
S_k = sum_j w_j z_j^k Y_j is a tensor contraction.  Refinement iterations
reuse S as the new probing block (reference -eps_ciss_refine_inner).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ksp import KSP
from ..mat.linop import AIJOperator, DenseOperator
from ..rg.rg import RGEllipse
from .base import EPS, EPSSolver, ProblemType


class CISS(EPSSolver):
    npoints = 32  # quadrature points (reference -eps_ciss_integration_points)
    blocksize = 16  # L (reference -eps_ciss_blocksize)
    moments = 4  # M (reference -eps_ciss_moments)
    refine = 2  # refinement iterations
    extraction = "rr"  # 'rr' (Rayleigh-Ritz) | 'hankel' (Beyn block-Hankel)

    def solve(self, eps: EPS) -> None:
        rg = eps.rg
        if rg is None:
            if eps.interval is not None:
                a, b = eps.interval
                rg = RGEllipse(center=0.5 * (a + b), radius=0.5 * (b - a),
                               vscale=0.1)
            else:
                raise ValueError("ciss requires a region (set_rg) or interval")
        A, B = eps.A, eps.B
        n = eps.n
        hermitian = eps.is_hermitian
        L = min(self.blocksize, n)
        M = max(1, min(self.moments, n // max(L, 1)))
        npt = self.npoints

        z, w = rg.contour(npt)
        rng = np.random.default_rng(0)
        V = rng.standard_normal((n, L))

        import scipy.sparse as sp

        As = A.to_scipy()
        Bs = B.to_scipy() if B is not None else None
        sparse = sp.issparse(As)
        if sparse and Bs is not None and not sp.issparse(Bs):
            Bs = sp.csr_matrix(Bs)

        # point-solve strategy (the reference's subcommunicator
        # parallelism over integration points, slepccontour.c:85-168):
        #   batched    — ALL shifted systems in one jitted vmapped
        #                iterative solve; with a task mesh the point axis
        #                shards over device groups (TPU-native subcomms)
        #   factorized — per-point host LU, thread-pool parallel
        mode = getattr(eps, "ciss_solver", "auto")
        if mode == "auto":
            import jax as _jax

            from ..mat.linop import AIJOperator, DenseOperator, DIAOperator

            jittable = isinstance(A, (AIJOperator, DenseOperator, DIAOperator)) \
                and (B is None or isinstance(
                    B, (AIJOperator, DenseOperator, DIAOperator)))
            mode = ("batched" if jittable
                    and _jax.default_backend() == "tpu" else "factorized")

        lam = X = errs = None
        for it in range(self.refine + 1):
            eps.its = it + 1
            BV = V if Bs is None else (Bs @ V if sparse else np.asarray(Bs) @ V)
            if mode == "batched":
                from ..parallel.tasks import (batched_shifted_solves,
                                              batched_shifted_solves_adaptive)

                tol_in = max(eps.tol * 1e-2, 1e-12)
                if getattr(eps, "ciss_task_mesh", None) is None:
                    # ADAPTIVE per-point tolerances: point j's solve error
                    # enters the moments as w_j z_j^k E_j, so points with
                    # small |w_j z_j^k| may be solved proportionally
                    # looser without moving S_k (reference contour
                    # machinery role, slepccontour.c:22-118); bucketed
                    # solves turn that into genuinely fewer matvecs.
                    # ciss_adaptive=False keeps one fixed-tol bucket (the
                    # counter stays available for A/B).
                    if getattr(eps, "ciss_adaptive", True):
                        zmag = np.maximum(np.abs(z), 1.0) ** max(M - 1, 0)
                        contrib = np.abs(w) * zmag
                        contrib = np.maximum(contrib, contrib.max() * 1e-12)
                        tols = np.clip(tol_in * contrib.max() / contrib,
                                       tol_in, 1e-3)
                        nbk = 3
                    else:
                        tols = np.full(len(z), tol_in)
                        nbk = 1
                    Yall, info = batched_shifted_solves_adaptive(
                        A, B, z, BV, tols=tols, nbuckets=nbk)
                    eps.ciss_inner_iters = info["inner_iters"]
                    eps.ciss_inner_buckets = info["buckets"]
                else:
                    Yall = np.asarray(batched_shifted_solves(
                        A, B, z, BV, tol=tol_in,
                        mesh=getattr(eps, "ciss_task_mesh", None)))
                # stall detection: iterative point solves near an
                # eigenvalue of the pencil are ill-conditioned and may
                # return garbage at the fixed tolerance; verify each
                # point's relative residual and re-solve offenders with
                # an exact host factorization (the reference's per-point
                # KSP is direct by default, ciss.c:283-316)
                nrm_bv = max(np.linalg.norm(BV), 1e-300)
                point_res = np.empty(npt)
                for j in range(npt):
                    Rj = (z[j] * (Bs @ Yall[j] if Bs is not None
                                  else Yall[j])
                          - As @ Yall[j]) - BV
                    point_res[j] = np.linalg.norm(Rj) / nrm_bv
                eps.ciss_point_residuals = point_res
                bad = np.flatnonzero(point_res > 1e3 * tol_in)
                if bad.size:
                    import scipy.sparse.linalg as spla

                    for j in bad:
                        if sparse:
                            Mz = (z[j] * (Bs if Bs is not None
                                          else sp.eye(n, format="csr"))
                                  - As).tocsc()
                            Yall[j] = spla.splu(Mz.astype(complex)).solve(
                                BV.astype(complex))
                        else:
                            Mz = z[j] * (np.asarray(Bs) if Bs is not None
                                         else np.eye(n)) - np.asarray(As)
                            Yall[j] = np.linalg.solve(Mz.astype(complex),
                                                      BV.astype(complex))
                    eps.ciss_refactored_points = bad.tolist()
                zk_pow = np.power.outer(z, np.arange(M)) * w[:, None]
                # S_k = sum_j w_j z_j^k Y_j
                S = np.concatenate(
                    [np.einsum("j,jnl->nl", zk_pow[:, k], Yall)
                     for k in range(M)], axis=1)
            else:
                from ..parallel.tasks import thread_map

                def point_solve(j):
                    # (z_j B - A) Y = B V — one factorization per point
                    # (the reference's per-subcomm KSP, ciss.c:283-316)
                    if sparse:
                        Mz = (z[j] * (Bs if Bs is not None
                                      else sp.eye(n, format="csr"))
                              - As).tocsc()
                        import scipy.sparse.linalg as spla

                        return spla.splu(Mz.astype(complex)).solve(
                            BV.astype(complex))
                    Mz = z[j] * (np.asarray(Bs) if Bs is not None
                                 else np.eye(n)) - np.asarray(As)
                    return np.linalg.solve(Mz.astype(complex),
                                           BV.astype(complex))

                Ys = thread_map(point_solve, range(npt))
                S = np.zeros((n, M * L), dtype=complex)
                for j in range(npt):
                    zk = 1.0
                    for k in range(M):
                        S[:, k * L: (k + 1) * L] += (w[j] * zk) * Ys[j]
                        zk *= z[j]

            extraction = getattr(eps, "ciss_extraction", self.extraction)
            if extraction == "hankel":
                # block-Hankel (Beyn) extraction: eigenvalues directly from
                # the moment pencil (reference EPS_CISS_EXTRACTION_HANKEL)
                mhat = M // 2
                Sk = [S[:, k2 * L: (k2 + 1) * L] for k2 in range(M)]
                H0 = np.block([[Sk[i2 + j2] for j2 in range(mhat)]
                               for i2 in range(mhat)])
                H1 = np.block([[Sk[i2 + j2 + 1] for j2 in range(mhat)]
                               for i2 in range(mhat)])
                Uh, svh, Wh = np.linalg.svd(H0, full_matrices=False)
                rk = max(int(np.sum(svh > 1e-11 * max(svh[0] if svh.size
                                                      else 0, 1e-300))), 1)
                U1, s1, W1 = Uh[:, :rk], svh[:rk], Wh[:rk, :].conj().T
                Bm = U1.conj().T @ H1 @ W1 / s1[None, :]
                wv, Yb = np.linalg.eig(Bm)
                Xc = U1[:n, :] @ Yb
                inside = rg.check_inside(wv) >= 0
                wv, Xc = wv[inside], Xc[:, inside]
                nrm = np.linalg.norm(Xc, axis=0)
                ok_cols = nrm > 1e-12
                wv, Xc, nrm = wv[ok_cols], Xc[:, ok_cols], nrm[ok_cols]
                Xc = Xc / nrm
                Xj = jnp.asarray(Xc)
                R = np.asarray(A.mult(Xj)) - (np.asarray(B.mult(Xj))
                                              if B is not None
                                              else np.asarray(Xj)) * wv[None, :]
                rn = np.linalg.norm(R, axis=0)
                errs = rn / np.maximum(np.abs(wv), 1e-300)
                order = np.argsort(wv.real)
                lam, X, errs = wv[order], Xc[:, order], errs[order]
                eps.monitor(eps, eps.its, int(np.sum(errs < eps.tol)), lam, errs)
                if lam.size and np.max(errs) < eps.tol:
                    break
                V = np.real(X) if not np.iscomplexobj(np.zeros(1, eps.A.dtype)) else X
                if V.shape[1] < L:
                    V = np.concatenate([V, rng.standard_normal((n, L - V.shape[1]))],
                                       axis=1)
                else:
                    V = V[:, :L]
                continue

            # rank-revealing orthonormalization of S (BVSVDAndRank analog)
            Q, sv, _ = np.linalg.svd(S, full_matrices=False)
            rank = int(np.sum(sv > 1e-11 * max(sv[0], 1e-300)))
            rank = max(rank, 1)
            Q = Q[:, :rank]

            # Rayleigh-Ritz on the extracted subspace
            Qj = jnp.asarray(Q)
            AQ = np.asarray(A.mult(Qj))
            G = Q.conj().T @ AQ
            if B is not None:
                BQ = np.asarray(B.mult(Qj))
                Mg = Q.conj().T @ BQ
            else:
                Mg = np.eye(rank, dtype=complex)
            import scipy.linalg as sla

            wv, C = sla.eig(G, Mg)
            Xc = Q @ C
            # keep pairs inside the region
            inside = rg.check_inside(wv) >= 0
            wv, Xc = wv[inside], Xc[:, inside]
            nrm = np.linalg.norm(Xc, axis=0)
            nrm[nrm == 0] = 1
            Xc = Xc / nrm
            # residuals
            Xj = jnp.asarray(Xc)
            R = np.asarray(A.mult(Xj)) - (np.asarray(B.mult(Xj)) if B is not None
                                          else np.asarray(Xj)) * wv[None, :]
            rn = np.linalg.norm(R, axis=0)
            errs = rn / np.maximum(np.abs(wv), 1e-300)
            order = np.argsort(wv.real)
            lam, X, errs = wv[order], Xc[:, order], errs[order]
            eps.monitor(eps, eps.its, int(np.sum(errs < eps.tol)), lam, errs)
            if lam.size and np.max(errs) < eps.tol:
                break
            # refinement: new probing block from the current subspace
            if lam.size:
                V = np.real(X @ np.diag(np.sign(rng.standard_normal(X.shape[1])))) \
                    if not np.iscomplexobj(np.zeros(1, eps.A.dtype)) else X
                if V.shape[1] < L:
                    V = np.concatenate(
                        [V, rng.standard_normal((n, L - V.shape[1]))], axis=1)
                else:
                    V = V[:, :L]
            else:
                V = rng.standard_normal((n, L))

        k = int(np.sum(errs < eps.tol * 100)) if errs is not None else 0
        eps.nconv = min(k, lam.size) if lam is not None else 0
        if hermitian and lam is not None and np.all(np.abs(lam.imag) < 1e-10):
            lam = lam.real
        eps.eigenvalues = lam[: eps.nconv] if lam is not None else np.array([])
        eps.errests = errs[: eps.nconv] if errs is not None else np.array([])
        eps._eigenvectors = (X[:, : eps.nconv] if X is not None
                             else np.zeros((n, 0), dtype=complex))


EPS.register("ciss", CISS)
