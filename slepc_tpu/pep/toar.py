"""PEP TOAR — two-level orthogonal Arnoldi with compact tensor basis.

Reference: src/pep/impls/krylov/toar/ptoar.c (828 LoC) + BVTENSOR
(src/sys/classes/bv/impls/tensor/bvtensor.c): Arnoldi on the shift-invert
companion linearization of P(lambda) = sum_i lambda^i A_i, with the d*n
Krylov basis stored compactly as V = (I_d (x) U) S — U an n x (m+d)
orthonormal "first level", S the small stacked coefficients.

Per step (PEPTOARExtendBasis analog, ptoar.c:102-167):
  d SpMVs + 1 P(sigma)-solve produce the new direction; ONE first-level
  CGS2 orthogonalization (two fused reductions — the only distributed
  communication); all second-level orthogonalization happens on the small
  replicated S coefficients.  Restart compresses S by SVD and rotates U
  (BVTensorCompress, ptoar.c:536).

Krylov-Schur restarts on the projected Hessenberg; eigenvalues map back by
lambda = sigma + 1/mu.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ds.schur import schur, sort_schur
from ..ksp import KSP
from ..sys.sort import SortCriterion, Which
from ..eps.krylovschur import _pair_keys


def _opnorm_est(m) -> float:
    """Cheap 2-norm-flavored operator norm for backward-error scales.

    Frobenius overestimates by up to sqrt(n) and masks bad pairs; the
    max-abs-row-sum (inf-norm) is a tight proxy for the banded/dense
    operators PEP sees.  Falls back to the Frobenius estimate."""
    d = getattr(m, "diags", None)
    if d is not None:
        return float(np.abs(np.asarray(d)).sum(axis=0).max())
    A = getattr(m, "A", None)
    if A is not None and getattr(A, "ndim", 0) == 2:
        return float(np.abs(np.asarray(A)).sum(axis=1).max())
    sp_m = getattr(m, "scipy_mat", None)
    if sp_m is not None:
        return float(abs(sp_m).sum(axis=1).max())
    return float(m.norm_estimate())


def _build_psigma_ksp(pep, sigma):
    """Factor P(sigma) = sum sigma^i A_i (the reference's ST factorization
    of the transformed polynomial)."""
    import scipy.sparse as sp

    from ..mat.linop import AIJOperator, DenseOperator, SumOperator

    coeffs = [sigma**i for i in range(pep.degree + 1)]
    try:
        mats_sc = [m.to_scipy() for m in pep.mats]
        Ps = sum(c * (M if sp.issparse(M) else np.asarray(M))
                 for c, M in zip(coeffs, mats_sc))
        Pop = AIJOperator.from_scipy(sp.csr_matrix(Ps)) if sp.issparse(Ps) \
            else DenseOperator(Ps)
        return KSP(Pop, method="direct")
    except Exception:
        return KSP(SumOperator(tuple(pep.mats), tuple(coeffs)), method="bicgstab")


def toar_solve(pep) -> None:
    mats = pep.mats
    d = pep.degree
    n = pep.n
    # common dtype over ALL coefficient matrices: a real A_0 with complex
    # A_1.. would otherwise silently truncate the recurrence to real
    # (measured failure: spurious converged pairs clustered at sigma)
    dtype = np.dtype(np.result_type(*[np.dtype(m.dtype) for m in mats]))
    cplx = np.issubdtype(dtype, np.complexfloating)
    nev = pep.nev
    ncv = pep.ncv or min(d * n, max(2 * nev, nev + 15))
    ncv = min(ncv, d * n - 1)
    tol = pep.tol if pep.tol is not None else (1e-8 if dtype.itemsize >= 8 else 1e-5)
    max_it = pep.max_it or max(100, 2 * (d * n) // ncv)
    sigma = complex(pep.target) if pep.target is not None else 0.0
    if sigma.imag == 0:
        sigma = sigma.real  # keep real arithmetic when possible
    elif not cplx:
        # complex shift on a real problem: promote the basis to complex
        dtype = np.dtype(np.complex128 if dtype.itemsize >= 8 else np.complex64)
        cplx = True
    sfactor = pep.compute_scale()
    pep.sfactor = sfactor
    if sfactor != 1.0:
        mats = [mats[i] * (sfactor**i) for i in range(d + 1)]
        sigma = sigma / sfactor
    sc = SortCriterion(Which.LARGEST_MAGNITUDE)  # in mu = 1/(lambda-sigma)

    ksp = _build_psigma_ksp(
        type("  ", (), {"degree": d, "mats": mats, "n": n})(), sigma)

    rmax = ncv + d + 1  # first-level capacity
    U = jnp.zeros((n, rmax), dtype=dtype)
    S = np.zeros((d * rmax, ncv + 1), dtype=dtype)  # stacked blocks (d, rmax)
    H = np.zeros((ncv + 1, ncv), dtype=dtype)

    # ---- initial column: random u0; S column = e-block ----
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal(n).astype(dtype) if not cplx else \
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(dtype)
    u0 /= np.linalg.norm(u0)
    U = U.at[:, 0].set(jnp.asarray(u0))
    r = 1  # current first-level size
    # first TOAR column: v = [u0; 0; ...; 0] normalized (BVTensorBuildFirstColumn)
    S[0, 0] = 1.0

    def s_block(col, i, rr):
        """View of S block i (rows over U columns 0..rr) for a column."""
        return col[i * rmax: i * rmax + rr]

    def extend(j, r):
        """One TOAR step: extend from column j (0-based) given r U-cols.

        Returns (r_new, hcol (j+2,), breakdown).
        """
        nonlocal U, S
        scol = S[:, j]
        s_i = [s_block(scol, i, r) for i in range(d)]
        # tau recurrence: t_{i+1} = sigma t_i + v_i  (coefficients over U)
        tau = [np.zeros(r, dtype=S.dtype)]
        for i in range(d - 1):
            tau.append(sigma * tau[i] + s_i[i])
        # rhs = -(A_d U (s_{d-1} + sigma tau_{d-1}) + sum_{i>=1} A_i U tau_i)
        Uact = U[:, :r]
        combo = np.column_stack([s_i[d - 1] + sigma * tau[d - 1]]
                                + [tau[i] for i in range(1, d)])
        Uc = Uact @ jnp.asarray(combo, dtype=dtype)  # (n, d)
        rhs = -mats[d].mult(Uc[:, 0])
        for i in range(1, d):
            rhs = rhs - mats[i].mult(Uc[:, i])
        z0 = ksp.solve(rhs)
        # first-level orthogonalization of z0 against U (CGS2, fused)
        c1 = Uact.conj().T @ z0
        z0 = z0 - Uact @ c1
        c2 = Uact.conj().T @ z0
        z0 = z0 - Uact @ c2
        c = np.asarray(c1 + c2)
        beta = float(jnp.linalg.norm(z0))
        grew = beta > 1e-14
        if grew:
            U = U.at[:, r].set(z0 / beta)
            r_new = r + 1
        else:
            r_new = r
        # zeta recurrence: z_i = sigma^i z0 + U zeta_i, zeta_{i+1} = sigma zeta_i + s_i
        zeta = [np.zeros(r, dtype=S.dtype)]
        for i in range(d - 1):
            zeta.append(sigma * zeta[i] + s_i[i])
        # new stacked column over r_new U-cols
        newcol = np.zeros(d * rmax, dtype=S.dtype)
        sig_i = 1.0
        for i in range(d):
            blk = newcol[i * rmax: i * rmax + r_new]
            blk[:r] = sig_i * c + zeta[i]
            if grew:
                blk[r] = sig_i * beta
            sig_i *= sigma
        # second level: orthogonalize against TOAR columns 0..j (small GEMV)
        Sprev = S[:, : j + 1]
        h1 = Sprev.conj().T @ newcol
        newcol = newcol - Sprev @ h1
        h2 = Sprev.conj().T @ newcol
        newcol = newcol - Sprev @ h2
        h = h1 + h2
        nrm = np.linalg.norm(newcol)
        brk = nrm < 1e-14 * max(1.0, np.linalg.norm(h))
        if not brk:
            S[:, j + 1] = newcol / nrm
        hcol = np.zeros(j + 2, dtype=S.dtype)
        hcol[: j + 1] = h
        hcol[j + 1] = nrm
        return r_new, hcol, brk

    k = 0  # locked
    l = 0
    lams = np.zeros(ncv, dtype=complex)
    errs = np.zeros(ncv)
    Tlock = np.zeros((ncv, ncv), dtype=complex if cplx else float)
    pep.its = 0
    nconv_final = 0

    while pep.its < max_it:
        pep.its += 1
        nv = ncv
        brk = False
        for j in range(k + l, nv):
            r, hcol, brk = extend(j, r)
            H[: j + 2, j] = hcol.astype(H.dtype) if not np.iscomplexobj(hcol) or cplx \
                else hcol.real
            if brk:
                nv = j + 1
                break
        beta = float(abs(H[nv, nv - 1])) if nv < ncv + 1 else 0.0
        Smat = H[k:nv, k:nv]
        Tproj, Q, mu = schur(Smat)
        keys = sc.keys(mu)
        if not cplx:
            keys = _pair_keys(Tproj, keys)
        Tproj, Q, mu = sort_schur(Tproj, Q, keys)
        na = nv - k
        last = Q[na - 1, :]
        resid = beta * np.abs(last)
        if not cplx:
            i = 0
            while i < na:
                if i + 1 < na and Tproj[i + 1, i] != 0.0:
                    rr_ = np.hypot(resid[i], resid[i + 1])
                    resid[i] = resid[i + 1] = rr_
                    i += 2
                else:
                    i += 1
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_ap = sigma + 1.0 / mu
        errest = resid / np.maximum(np.abs(mu), 1e-300)  # residual in mu space

        k2 = k
        while k2 < nv and errest[k2 - k] < tol:
            k2 += 1
        if not cplx:
            dd = k2 - k
            if 0 < dd < na and Tproj[dd, dd - 1] != 0.0:
                k2 -= 1
        done = k2 >= nev or pep.its >= max_it or brk
        if done:
            l = 0
        else:
            l = max(1, (nv - k2) // 2)
            l = min(l, max(nv - k2 - 1, 0))
            if not cplx and l > 0:
                dd = k2 - k + l
                if dd < na and Tproj[dd, dd - 1] != 0.0:
                    l += 1 if dd + 1 < na else -1
        kl = (k2 - k) + l

        for i in range(k2 - k):
            lams[k + i] = lam_ap[i]
            errs[k + i] = errest[i]
            Tlock[k:k2, k:k2] = Tproj[: k2 - k, : k2 - k].real if not cplx \
                else Tproj[: k2 - k, : k2 - k]

        if kl > 0:
            Qk = Q[:, :kl].real if not np.iscomplexobj(S) else Q[:, :kl]
            S[:, k: k + kl] = S[:, k:nv] @ Qk
            Hh2 = np.zeros_like(H)
            Hh2[:k2, :k2] = Tlock[:k2, :k2].real if not cplx else Tlock[:k2, :k2]
            if not done and l > 0:
                blk = Tproj[k2 - k: k2 - k + l, k2 - k: k2 - k + l]
                Hh2[k2: k2 + l, k2: k2 + l] = blk.real if not cplx else blk
                coup = Tproj[: k2 - k, k2 - k: k2 - k + l]
                Hh2[k: k2, k2: k2 + l] = coup.real if not cplx else coup
                arrow = beta * last[k2 - k: k2 - k + l]
                Hh2[k2 + l, k2: k2 + l] = arrow.real if not cplx else arrow
                S[:, k2 + l] = S[:, nv]
            H = Hh2
            # ---- compress the tensor basis (BVTensorCompress) ----
            ncols = k2 + l + (0 if done else 1)
            Sb = S[:, :ncols]
            M = np.concatenate([Sb[i * rmax: i * rmax + r, :] for i in range(d)],
                               axis=1)  # (r, d*ncols)
            Ur_, sv, _ = np.linalg.svd(M, full_matrices=False)
            rho = int(np.sum(sv > 1e-13 * max(sv[0] if sv.size else 0, 1e-300)))
            # capacity invariant: the next cycle adds one U column per
            # extension step, so rho must leave room (rho <= ncols+d-1
            # keeps r <= ncv+d = rmax-1 at cycle end)
            rho = max(min(rho, r, ncols + d - 1), 1)
            W = Ur_[:, :rho]
            Uact = U[:, :r] @ jnp.asarray(W, dtype=dtype)
            U = U.at[:, :rho].set(Uact)
            Snew = np.zeros_like(S)
            for i in range(d):
                Snew[i * rmax: i * rmax + rho, :ncols] = \
                    W.conj().T @ Sb[i * rmax: i * rmax + r, :]
            S = Snew
            r = rho
        k = k2
        nconv_final = k
        if done:
            break

    # ---- extraction: eigenvectors of the locked Schur block ----
    pep.nconv = nconv_final
    k = nconv_final
    if k:
        Tb = Tlock[:k, :k]
        wb, Y = np.linalg.eig(Tb)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_fin = sigma + 1.0 / wb
        # big-space Ritz vectors from the tensor basis: the linearization
        # eigenvector stacks d candidate blocks x_i = U S^(i) y with
        # x_i ~ mu^i x_0; the EXTRACTION choice picks how to read x off
        # them (reference PEPSetExtraction, pepkrylov.c PEPExtractVectors:
        # NONE = first block, NORM = largest block, RESIDUAL = block with
        # the smallest true residual, STRUCTURED = mu-weighted average)
        Un = np.asarray(U[:, :r])
        blocks = [Un @ (S[i * rmax: i * rmax + r, :k] @ Y)
                  for i in range(d)]
        extract = str(getattr(pep, "extract", None) or "best").lower()
        mats0 = pep.mats  # ORIGINAL (unscaled) coefficients
        nrm_mats = [max(_opnorm_est(m), 1e-300) for m in mats0]
        if sfactor != 1.0:
            lam_fin = lam_fin * sfactor
        import jax.numpy as _jnp

        def _eta(lamj, xv):
            """Tisseur backward error of (lamj, xv) on the ORIGINAL
            polynomial: ||P(lam)x|| / (sum |lam|^i ||A_i||_2est ||x||)."""
            nv_ = np.linalg.norm(xv)
            if not nv_ > 0 or not np.isfinite(nv_):
                return np.inf
            xj = _jnp.asarray(xv / nv_)
            rj = None
            lp = 1.0
            scale = 0.0
            for i, mm in enumerate(mats0):
                t = np.asarray(mm.mult(xj)) * lp
                rj = t if rj is None else rj + t
                scale += abs(lp) * nrm_mats[i]
                lp *= lamj
            return float(np.linalg.norm(rj) / scale)

        X = blocks[0].copy()
        etas = np.zeros(k)
        for j in range(k):
            mu_j = wb[j]
            cands = [blocks[i][:, j] for i in range(d)]
            acc = np.zeros(n, dtype=complex)
            wgt = 1.0
            for i in range(d):  # structured: weight block i by conj(mu^i)
                acc += np.conj(wgt) * cands[i]
                wgt *= mu_j
            nrms = [np.linalg.norm(c) for c in cands]
            if extract == "none":
                pick = [cands[0]]
            elif extract == "norm":
                pick = [cands[int(np.argmax(nrms))]]
            elif extract == "structured":
                pick = [acc]
            elif extract == "residual":
                pick = cands
            else:  # "best": every block AND the structured combination —
                # which read-off is accurate is problem-dependent
                # (measured: structured wins on a boundary-damped
                # acoustic QEP, first-block on speaker107), and the true
                # residual is the only reliable referee
                pick = cands + [acc]
            best_eta, best_v = np.inf, pick[0]
            for v in pick:
                e_ = _eta(lam_fin[j], v)
                if e_ < best_eta:
                    best_eta, best_v = e_, v
            X[:, j] = best_v
            etas[j] = best_eta if len(pick) > 1 else _eta(lam_fin[j],
                                                         best_v)
        nrm = np.linalg.norm(X, axis=0)
        nrm[nrm == 0] = 1
        X = X / nrm
        order = np.argsort(sc.keys(1.0 / (lam_fin / sfactor - sigma)
                                   if sfactor != 1.0 else wb), kind="stable")
        lam_fin, X, etas = lam_fin[order], X[:, order], etas[order]
        errs_o = errs[:k][order] if len(errs) >= k else np.zeros(k)
        # ---- spurious-pair guard: the mu-space errest divides by |mu|,
        # so a breakdown-born Ritz value with huge |mu| (lambda ~ sigma
        # in a spectral gap) can pass tol while its TRUE backward error
        # is O(1).  Certify each pair against the explicit polynomial
        # residual (reference role: PEPConvergedNorm / -pep_conv_norm,
        # pepdefault.c) and drop failures.
        keep = np.isfinite(etas) & (etas <= max(1e4 * tol, 1e-6))
        errs_o = np.maximum(errs_o, np.where(np.isfinite(etas), etas,
                                             np.inf))
        if not keep.all():
            lam_fin, errs_o, X = lam_fin[keep], errs_o[keep], X[:, keep]
            k = int(keep.sum())
            pep.nconv = k
        pep.eigenvalues = lam_fin
        pep.errests = errs_o
        pep._eigenvectors = X
    else:
        pep.eigenvalues = np.array([])
        pep.errests = np.array([])
        pep._eigenvectors = np.zeros((n, 0), dtype=dtype)
