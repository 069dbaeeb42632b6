"""EPS Davidson-type solvers: GD (generalized Davidson) and JD
(Jacobi-Davidson).

Reference: src/eps/impls/davidson/ (4,335 LoC framework: davidson.c +
dvdcalcpairs/dvdimprovex/dvdupdatev/dvdschm) with thin wrappers gd/gd.c and
jd/jd.c.  The composable sub-scheme structure collapses here into one loop
with a pluggable *improver*:

  GD: expand with the preconditioned residual t = K^-1 r.
  JD: expand with an approximate solution of the projected correction
      equation  (I - Q Q^H)(A - sigma B)(I - Q Q^H) t = -r  where Q spans
      the locked vectors plus the current Ritz vector — solved by
      right-preconditioned projected GMRES with the reference's adaptive
      controls (dvdimprovex.c:625-673,931-971):
        * shift fix rule: sigma = target while ||r|| > fix (avoids early
          misconvergence), sigma = theta (RQI regime) once below
          (EPSJDSetFix, default 0.01);
        * dynamic inner tolerance 0.5^j for the j-th attempt on the
          current pair (Fokkema-Sleijpen), floored at eps.tol.

Block expansion (bs > 1, reference davidson framework blocksize): the bs
best unconverged Ritz pairs each contribute a correction per outer
iteration.  Restart keeps the best `minv` Ritz vectors plus `plusk`
previous corrections (dvdupdatev.c role, -eps_gd_minv/-eps_gd_plusk).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bv.orthog import cholqr2
from ..st.st import STPrecond
from ..sys.sort import SortCriterion
from .base import EPS, EPSSolver


def _real_cols(C, cplx: bool):
    """Eigenvector columns for a REAL search space: complex harmonic pairs
    contribute their real and imaginary parts as separate directions
    (avoids the silent complex->real cast)."""
    if cplx or not np.iscomplexobj(C):
        return C
    if np.abs(C.imag).max() < 1e-12 * max(np.abs(C).max(), 1e-300):
        return np.ascontiguousarray(C.real)
    cols = []
    j = 0
    while j < C.shape[1]:
        c = C[:, j]
        if np.abs(c.imag).max() < 1e-12 * max(np.abs(c).max(), 1e-300):
            cols.append(c.real)
            j += 1
        else:
            cols.append(c.real)
            cols.append(c.imag)
            j += 2
    M = np.stack(cols[: C.shape[1]], axis=1)
    return np.ascontiguousarray(M)


def _gmres_projected(apply_op, apply_pc, b, rtol: float, maxiter: int):
    """Right-preconditioned GMRES (one cycle, m = maxiter) for the
    projected correction equation; small m, host-orchestrated Hessenberg
    (the projected problems are tiny next to the matvecs)."""
    m = maxiter
    cplx = np.issubdtype(np.dtype(b.dtype), np.complexfloating)
    bn = float(jnp.linalg.norm(b))
    if bn == 0.0:
        return jnp.zeros_like(b)
    Vs = [b / bn]
    Hm = np.zeros((m + 1, m), dtype=complex)
    for j in range(m):
        z = apply_pc(Vs[j])
        w = apply_op(z)
        for i in range(j + 1):
            hij = jnp.vdot(Vs[i], w)  # stays in the operand dtype
            Hm[i, j] = complex(hij)
            w = w - hij * Vs[i]
        hn = float(jnp.linalg.norm(w))
        Hm[j + 1, j] = hn
        # solve the small least-squares for the residual estimate
        e1 = np.zeros(j + 2, dtype=complex)
        e1[0] = bn
        y, res, *_ = np.linalg.lstsq(Hm[: j + 2, : j + 1], e1, rcond=None)
        rres = float(np.linalg.norm(Hm[: j + 2, : j + 1] @ y - e1)) / bn
        if hn < 1e-14 or rres < rtol or j == m - 1:
            yc = y if cplx else y.real
            t = None
            for i in range(j + 1):
                c = Vs[i] * yc[i]
                t = c if t is None else t + c
            return apply_pc(t)
        Vs.append(w / hn)
    return apply_pc(Vs[0] * bn)  # unreachable


class _Davidson(EPSSolver):
    jd_correction = False

    def solve(self, eps: EPS) -> None:
        # fused GD fast path (eps/gd_jit.py): standard HEP, Jacobi/identity
        # preconditioner, single correction per iteration — one XLA program
        # per subspace fill instead of ~15 relay dispatches per outer
        # iteration.  eps.gd_fused = False forces the host loop.
        if (not self.jd_correction and getattr(eps, "gd_fused", True)
                and eps.B is None and eps.is_hermitian
                and getattr(eps, "extraction", None) in (None, "", "ritz")
                and max(1, int(getattr(eps, "davidson_bs", 1) or 1)) == 1):
            from ..sys.sort import Which as _W

            wmap = {_W.SMALLEST_REAL: "smallest", _W.LARGEST_REAL: "largest"}
            w = wmap.get(eps.which)
            if w is not None and not getattr(eps.A, "host_callback", False):
                from .gd_jit import gd_hep_solve

                if gd_hep_solve(eps, eps.A, w):
                    return
        st = eps.st
        A, B = eps.A, eps.B
        n, ncv = eps.n, eps.ncv
        minv = max(eps.nev, min(6, ncv // 2))
        plusk = int(getattr(eps, "davidson_plusk", 1) or 0)
        bs = max(1, int(getattr(eps, "davidson_bs", 1) or 1))
        fix = float(getattr(eps, "jd_fix", 0.01) or 0.01)
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)
        hermitian = eps.is_hermitian
        sc = eps.sort_criterion()

        precond = (st.preconditioner() if isinstance(st, STPrecond)
                   else (lambda r: r))

        rng = np.random.default_rng(0)
        v0 = rng.standard_normal((n, max(bs, 1)))
        if cplx:
            v0 = v0 + 1j * rng.standard_normal(v0.shape)
        if eps.initial_space is not None:
            k0 = min(eps.initial_space.shape[1], bs)
            v0[:, :k0] = np.asarray(eps.initial_space[:, :k0]).reshape(n, k0)
        Vj, _ = cholqr2(jnp.asarray(v0, dtype=dtype))

        locked_X: list[np.ndarray] = []
        locked_lam: list[complex] = []
        locked_err: list[float] = []
        prev_t: list[jnp.ndarray] = []  # plusk retained corrections
        inner_j = 0  # attempts on the current leading pair
        eps.matvecs = 0

        import scipy.linalg as sla

        while eps.its < eps.max_it and len(locked_lam) < eps.nev:
            eps.its += 1
            m = Vj.shape[1]
            AV = A.mult(Vj)
            BV = B.mult(Vj) if B is not None else Vj
            eps.matvecs += m * (2 if B is not None else 1)

            if eps.extraction == "harmonic" and eps.target is not None:
                # harmonic Rayleigh-Ritz (reference: the Davidson
                # EPS_HARMONIC route, dvdcalcpairs.c): with
                # W = (A - tau B) V, solve W^H W c = xi W^H B V c;
                # theta = tau + xi selects interior pairs reliably
                tau = complex(eps.target)
                Wv = AV - (tau if cplx else tau.real) * BV
                G1 = np.asarray(Wv.conj().T @ Wv)
                M1 = np.asarray(Wv.conj().T @ BV)
                xi, C = sla.eig(G1, M1)
                fin = np.isfinite(xi)
                xi, C = xi[fin], C[:, fin]
                w = tau + xi
            else:
                G = np.asarray(Vj.conj().T @ AV)
                M = np.asarray(Vj.conj().T @ BV)
                if hermitian:
                    Ms = 0.5 * (M + M.conj().T)
                    try:
                        w, C = sla.eigh(0.5 * (G + G.conj().T), Ms)
                    except sla.LinAlgError:
                        # f32 basis drift can push the Gram indefinite
                        # (observed on TPU at tight subspaces): ridge it
                        # back to SPD instead of killing the solve
                        ridge = 1e-6 * max(np.trace(Ms).real
                                           / max(len(Ms), 1), 1e-30)
                        w, C = sla.eigh(0.5 * (G + G.conj().T),
                                        Ms + ridge * np.eye(len(Ms)))
                    w = w.astype(complex)
                else:
                    w, C = sla.eig(G, M)
            keys = sc.keys(w)
            order = np.argsort(keys, kind="stable")
            w, C = w[order], C[:, order]
            Cr = _real_cols(C, cplx)

            # leading Ritz pair
            u = Vj @ jnp.asarray(Cr[:, 0], dtype=dtype)
            u = u / jnp.linalg.norm(u)
            Au = A.mult(u)
            Bu = B.mult(u) if B is not None else u
            eps.matvecs += 2 if B is not None else 1
            theta = complex(jnp.vdot(u, Au) / jnp.vdot(u, Bu))
            if hermitian and not cplx:
                theta = theta.real
            r = Au - theta * Bu
            rn = float(jnp.linalg.norm(r))
            err = eps.conv_measure(theta, rn)
            eps.monitor(eps, eps.its, len(locked_lam),
                        np.concatenate([np.asarray(locked_lam, complex), w[:1]]),
                        np.concatenate([locked_err, [err]]))

            if err < eps.tol:
                locked_X.append(np.asarray(u))
                locked_lam.append(theta)
                locked_err.append(err)
                inner_j = 0
                # deflate: remove u from V, continue with next Ritz vectors
                keep = min(minv, m - 1) if m > 1 else 1
                Ck = (jnp.asarray(Cr[:, 1: keep + 1], dtype=dtype)
                      if m > 1 else None)
                if Ck is not None and Ck.shape[1] > 0:
                    Vj = Vj @ Ck
                else:
                    v = jnp.asarray(rng.standard_normal(n), dtype=dtype)
                    Vj = v[:, None]
                Vj = _deflate_block(Vj, locked_X)
                Vj, _ = cholqr2(Vj)
                continue

            inner_j += 1
            # --- improver: bs corrections from the bs best unconverged ---
            new_dirs = []
            nblk = min(bs, Cr.shape[1])
            for ib in range(nblk):
                if ib == 0:
                    ub, thb, rb = u, theta, r
                else:
                    ub = Vj @ jnp.asarray(Cr[:, ib], dtype=dtype)
                    ub = ub / jnp.linalg.norm(ub)
                    Aub = A.mult(ub)
                    Bub = B.mult(ub) if B is not None else ub
                    eps.matvecs += 2 if B is not None else 1
                    thb = complex(jnp.vdot(ub, Aub) / jnp.vdot(ub, Bub))
                    if hermitian and not cplx:
                        thb = thb.real
                    rb = Aub - thb * Bub
                if self.jd_correction:
                    # shift fix rule (EPSJDSetFix): target until the
                    # residual is small, then the Rayleigh quotient
                    sigma = (complex(eps.target)
                             if (eps.target is not None and err > fix)
                             else thb)
                    if not cplx:
                        sigma = np.real(sigma)
                    rtol_in = max(float(eps.tol), 0.5 ** inner_j)
                    maxit_in = int(getattr(eps, "jd_inner_maxit", 24) or 24)
                    t, mv = _jd_correct(A, B, ub, sigma, rb, precond,
                                        locked_X, rtol_in, maxit_in)
                    eps.matvecs += mv
                else:
                    t = jnp.asarray(precond(rb))
                t = _deflate_block(t[:, None] if t.ndim == 1 else t,
                                   locked_X)[:, 0]
                t = t - Vj @ (Vj.conj().T @ t)
                t = t - Vj @ (Vj.conj().T @ t)
                for d in new_dirs:
                    t = t - d * jnp.vdot(d, t)
                tn = jnp.linalg.norm(t)
                if float(tn) < 1e-13:
                    t = jnp.asarray(rng.standard_normal(n), dtype=dtype)
                    t = t - Vj @ (Vj.conj().T @ t)
                    tn = jnp.linalg.norm(t)
                new_dirs.append(t / tn)
            eps.expansions += len(new_dirs)

            if m + len(new_dirs) > ncv:
                # restart: best minv Ritz vectors + plusk prior corrections
                Ck = jnp.asarray(Cr[:, :minv], dtype=dtype)
                Vnew = Vj @ Ck
                for pt in prev_t[-plusk:]:
                    pt = pt - Vnew @ (Vnew.conj().T @ pt)
                    ptn = float(jnp.linalg.norm(pt))
                    if ptn > 1e-10:
                        Vnew = jnp.concatenate([Vnew, (pt / ptn)[:, None]],
                                               axis=1)
                Vj, _ = cholqr2(Vnew)
            prev_t = (prev_t + new_dirs)[-max(plusk, 1):]
            Vj = jnp.concatenate(
                [Vj] + [t[:, None] for t in new_dirs], axis=1)

        k = len(locked_lam)
        eps.nconv = k
        eps.eigenvalues = np.array(locked_lam, dtype=complex)
        if k and np.all(np.abs(np.imag(eps.eigenvalues)) < 1e-14):
            eps.eigenvalues = eps.eigenvalues.real
        eps.errests = np.array(locked_err)
        eps._eigenvectors = (np.stack(locked_X, axis=1) if locked_X
                             else np.zeros((n, 0), dtype=dtype))


def _deflate_block(V, locked):
    for x in locked:
        xj = jnp.asarray(x)
        V = V - xj[:, None] @ (xj.conj()[None, :] @ V)
    return V


def _jd_correct(A, B, u, sigma, r, precond, locked, rtol: float,
                maxiter: int):
    """JD correction equation via projected right-preconditioned GMRES:
    (I - Q Q^H)(A - sigma B)(I - Q Q^H) t = -r, Q = [locked, u]
    (reference dvdimprovex.c inner KSP).  Returns (t, matvec_count)."""
    Q = [jnp.asarray(x) for x in locked] + [u]
    mv = [0]

    def proj(v):
        for q in Q:
            v = v - q * jnp.vdot(q, v)
        return v

    def apply_op(v):
        v = proj(v)
        Av = A.mult(v)
        Bv = B.mult(v) if B is not None else v
        mv[0] += 2 if B is not None else 1
        return proj(Av - sigma * Bv)

    def apply_pc(v):
        return proj(jnp.asarray(precond(v)))

    t = _gmres_projected(apply_op, apply_pc, -proj(r), rtol, maxiter)
    return proj(t), mv[0]


class GD(_Davidson):
    """Generalized Davidson (reference gd/gd.c)."""

    jd_correction = False


class JD(_Davidson):
    """Jacobi-Davidson (reference jd/jd.c)."""

    jd_correction = True


EPS.register("gd", GD)
EPS.register("jd", JD)
