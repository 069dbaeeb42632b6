"""PEP Q-Arnoldi: memory-saving Krylov for quadratic eigenproblems.

Reference: src/pep/impls/krylov/qarnoldi/qarnoldi.c (518 LoC), after
Meerbergen's Q-Arnoldi method.  For the QEP P(lam) = K + lam C + lam^2 M,
run Arnoldi on the shift-inverted companion WITHOUT storing the 2n-long
basis: use the linearization with the "top' = bottom" structure

    O [v; w] = [w; -P(sigma)^{-1} (M v + (C + 2 sigma M) w)]

(eigenvalues mu = 1/(lam - sigma)).  The Arnoldi relation then forces the
bottom blocks of the basis to satisfy  bottom_i = V H[:, i]  — they are
linear combinations of the stored TOP blocks — so only the n-row top
block V (ncv+1 columns) plus the current bottom w are kept: half the
memory of Arnoldi on the explicit 2n linearization, at the price of a
mildly less stable orthogonalization (coefficients reconstructed through
H; the reference makes the same trade, qarnoldi.c:87-126).

Krylov-Schur thick restart preserves the bottom-block identity because
the rotated H keeps the Arnoldi relation (same algebra as toar.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eps.krylovschur import _pair_keys
from ..ds.schur import schur, sort_schur
from ..sys.sort import SortCriterion, Which
from .toar import _build_psigma_ksp


def qarnoldi_solve(pep) -> None:
    """Solve a QEP by Q-Arnoldi with shift-and-invert at pep.target."""
    if pep.degree != 2:
        raise ValueError("qarnoldi handles quadratic problems (3 matrices); "
                         "use toar for general degree")
    mats = pep.mats
    n = pep.n
    dtype = np.dtype(mats[0].dtype)
    cplx = np.issubdtype(dtype, np.complexfloating)
    nev = pep.nev
    ncv = pep.ncv or min(2 * n, max(2 * nev, nev + 15))
    ncv = min(ncv, 2 * n - 1)
    tol = pep.tol if pep.tol is not None else (1e-8 if dtype.itemsize >= 8
                                               else 1e-5)
    max_it = pep.max_it or max(100, 2 * (2 * n) // ncv)
    sigma = complex(pep.target) if pep.target is not None else 0.0
    if sigma.imag == 0:
        sigma = sigma.real
    elif not cplx:
        dtype = np.dtype(np.complex128 if dtype.itemsize >= 8
                         else np.complex64)
        cplx = True
    sfactor = pep.compute_scale()
    pep.sfactor = sfactor
    if sfactor != 1.0:
        mats = [mats[i] * (sfactor ** i) for i in range(3)]
        sigma = sigma / sfactor
    K, C, M = mats
    sc = SortCriterion(Which.LARGEST_MAGNITUDE)  # in mu

    ksp = _build_psigma_ksp(
        type("  ", (), {"degree": 2, "mats": mats, "n": n})(), sigma)

    V = jnp.zeros((n, ncv + 1), dtype=dtype)
    H = np.zeros((ncv + 1, ncv), dtype=dtype)

    rng = np.random.default_rng(0)

    def randvec():
        c = rng.standard_normal(n)
        if cplx:
            c = c + 1j * rng.standard_normal(n)
        return jnp.asarray(c, dtype=dtype)

    v = randvec()
    w = randvec()
    nz = float(np.hypot(jnp.linalg.norm(v), jnp.linalg.norm(w)))
    v, w = v / nz, w / nz
    V = V.at[:, 0].set(v)

    T1c = 2.0 * sigma  # T1 = C + 2 sigma M

    def apply_op(v, w):
        """[v; w] -> [w; -P(sigma)^{-1}(M v + (C + 2 sigma M) w)]."""
        rhs = M.mult(v) + C.mult(w)
        if T1c != 0.0:
            rhs = rhs + T1c * M.mult(w)
        u = -ksp.solve(rhs)
        return w, u

    def cgs_pass(j, vt, wt, w_old):
        """One CGS pass of [vt; wt] against columns 0..j (bottoms through
        H; bottom_j = w_old).  Returns (vt, wt, h (j+1,))."""
        Vact = V[:, : j + 1]
        h = np.array(Vact.conj().T @ vt)  # writable host copy
        work = np.asarray(Vact.conj().T @ wt)
        if j > 0:
            h[:j] += H[: j + 1, :j].conj().T @ work
        h[j] += complex(jnp.vdot(w_old, wt)) if cplx else \
            float(jnp.vdot(w_old, wt).real)
        vt = vt - Vact @ jnp.asarray(h, dtype=dtype)
        if j > 0:
            bot_c = H[: j + 1, :j] @ h[:j]
            wt = wt - Vact @ jnp.asarray(bot_c, dtype=dtype)
        wt = wt - h[j] * w_old
        return vt, wt, h

    def extend(j, v, w):
        """Q-Arnoldi step from column j; returns (v', w', hcol, breakdown)."""
        vt, wt = apply_op(v, w)
        w_old = w  # bottom block of column j
        vt, wt, h1 = cgs_pass(j, vt, wt, w_old)
        vt, wt, h2 = cgs_pass(j, vt, wt, w_old)  # CGS2
        h = h1 + h2
        nrm = float(np.hypot(jnp.linalg.norm(vt), jnp.linalg.norm(wt)))
        brk = nrm < 1e-14 * max(1.0, float(np.linalg.norm(h)))
        hcol = np.zeros(j + 2, dtype=H.dtype)
        hcol[: j + 1] = h.real if not cplx else h
        hcol[j + 1] = nrm
        if brk:
            return v, w, hcol, True
        return vt / nrm, wt / nrm, hcol, False

    k = 0
    l = 0
    lams = np.zeros(ncv, dtype=complex)
    errs = np.zeros(ncv)
    Tlock = np.zeros((ncv, ncv), dtype=complex if cplx else float)
    pep.its = 0
    nconv_final = 0

    while pep.its < max_it:
        pep.its += 1
        V = V.at[:, k + l].set(v)
        nv = ncv
        brk = False
        for j in range(k + l, nv):
            v, w, hcol, brk = extend(j, v, w)
            H[: j + 2, j] = hcol
            if brk:
                nv = j + 1
                break
            if j < nv - 1:
                V = V.at[:, j + 1].set(v)
        beta = float(abs(H[nv, nv - 1])) if not brk else 0.0
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
        errest = resid / np.maximum(np.abs(mu), 1e-300)

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

        with np.errstate(divide="ignore", invalid="ignore"):
            lam_ap = sigma + 1.0 / mu
        for i in range(k2 - k):
            lams[k + i] = lam_ap[i]
            errs[k + i] = errest[i]
        Tlock[k:k2, k:k2] = Tproj[: k2 - k, : k2 - k].real if not cplx \
            else Tproj[: k2 - k, : k2 - k]

        if kl > 0:
            Qk = Q[:, :kl].real if not cplx else Q[:, :kl]
            Vrot = V[:, k:nv] @ jnp.asarray(Qk, dtype=dtype)
            V = V.at[:, k: k + kl].set(Vrot)
            Hh2 = np.zeros_like(H)
            Hh2[:k2, :k2] = Tlock[:k2, :k2].real if not cplx \
                else Tlock[:k2, :k2]
            if not done and l > 0:
                blk = Tproj[k2 - k: k2 - k + l, k2 - k: k2 - k + l]
                Hh2[k2: k2 + l, k2: k2 + l] = blk.real if not cplx else blk
                coup = Tproj[: k2 - k, k2 - k: k2 - k + l]
                Hh2[k: k2, k2: k2 + l] = coup.real if not cplx else coup
                arrow = beta * last[k2 - k: k2 - k + l]
                Hh2[k2 + l, k2: k2 + l] = arrow.real if not cplx else arrow
            H = Hh2
        k = k2
        nconv_final = k
        if done:
            if brk and k < nev:
                pep.reason = "DIVERGED_BREAKDOWN"
            break

    pep.nconv = nconv_final
    k = nconv_final
    if k:
        Tb = Tlock[:k, :k]
        wb, Y = np.linalg.eig(Tb)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_fin = sigma + 1.0 / wb
        X = np.asarray(V[:, :k]) @ Y  # companion tops are the eigenvectors
        nrm = np.linalg.norm(X, axis=0)
        nrm[nrm == 0] = 1
        X = X / nrm
        if sfactor != 1.0:
            lam_fin = lam_fin * sfactor
        order = np.argsort(
            np.abs(lam_fin - (pep.target if pep.target is not None else 0.0)))
        pep.eigenvalues = lam_fin[order]
        pep.errests = errs[:k][order]
        pep._eigenvectors = X[:, order]
    else:
        pep.eigenvalues = np.array([])
        pep.errests = np.array([])
        pep._eigenvectors = np.zeros((n, 0), dtype=dtype)
