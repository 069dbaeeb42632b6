"""EPS Krylov–Schur — the default solver.

Reference: src/eps/impls/krylov/krylovschur/krylovschur.c (main loop
:227-337): thick-restart Arnoldi/Lanczos with Schur-form restarts, keep
fraction 0.5, locking.  Variants dispatched at setup in the reference
(:100-192): DEFAULT (non-Hermitian), SYMM (Hermitian thick-restart
Lanczos), INDEF (pseudo-Lanczos, GHIEP), FILTER, SLICE, TWOSIDED — here
DEFAULT/SYMM/INDEF/FILTER are one parameterized loop; SLICE lives in
ks_slice.py, TWOSIDED in ks_twosided.py.

TPU mapping of one outer iteration:
  basis extension  -> one jitted lax.fori_loop (SpMV + fused-reduction CGS2
                      per column; slepc_tpu.bv.krylov.arnoldi_extend)
  projected solve  -> host dense LAPACK on the (m-k) x (m-k) active block,
                      replicated (DS tier)
  restart          -> one device GEMM V[:, k:m] @ Q_kept (BVMultInPlace
                      analog)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bv.bv import BV
from ..bv.krylov import extend_dispatch
from ..ds.schur import schur, schur_eigvectors, sort_schur
from ..mat.linop import LinearOperator
from ..st.filter import STFilter
from ..sys.sort import SortCriterion
from .base import EPS, EPSConvergedReason, EPSSolver, ProblemType


class KrylovSchur(EPSSolver):
    """Krylov-Schur with locking; HEP/NHEP/GHEP/GHIEP + filter variants."""

    keep = 0.5  # restart kept fraction (reference krylovschur.c:122)

    def solve(self, eps: EPS) -> None:
        from ..sys.sort import Which as _W

        if eps.which == _W.ALL and eps.interval is not None and not isinstance(
                eps.st, STFilter):
            # spectrum slicing variant (reference ks-slice.c dispatch)
            from .ks_slice import slice_solve

            slice_solve(eps)
            return
        if eps.problem_type == ProblemType.BSE:
            # structure-preserving BSE variant (reference ks-bse.c dispatch)
            from .bse import KrylovSchurBSE

            KrylovSchurBSE().solve(eps)
            return
        if eps.two_sided and not (eps.is_hermitian and eps.B is None):
            # coupled BiKS variant (reference ks-twosided.c) when the
            # transformed operator exposes an adjoint apply; otherwise the
            # dual-run fallback in base._solve_left covers it
            op_try = eps.st.op()
            from ..mat.linop import ShellOperator as _Shell

            has_adj = not (isinstance(op_try, _Shell)
                           and op_try._rmatvec is None)
            if has_adj:
                from .ks_twosided import twosided_solve

                twosided_solve(eps)
                return
        st = eps.st
        op = st.op()
        n, ncv, nev, mpd = eps.n, eps.ncv, eps.nev, eps.mpd
        # harmonic extraction forces the non-Hermitian (Hessenberg) machinery
        # even for symmetric A (reference krylovschur.c:239)
        use_harmonic = eps.extraction == "harmonic"
        hermitian = (eps.is_hermitian and not use_harmonic
                     and not getattr(st, "requires_rayleigh", False))
        # matrix-free balancing (EPSSetBalance; NHEP shift problems only)
        balance_d = None
        if (eps.balance and not hermitian and eps.B is None
                and type(st).__name__ == "STShift" and st.sigma == 0):
            from .balance import balanced_operator, krylov_balance

            balance_d = krylov_balance(eps.A, its=eps.balance_its)
            op = balanced_operator(eps.A, balance_d)
        # use the Hermitian fast path also for filtered runs (A Hermitian)
        if isinstance(st, STFilter):
            hermitian = eps.is_hermitian and not use_harmonic
        indefinite = eps.problem_type == ProblemType.GHIEP
        dtype = np.dtype(eps.A.dtype)
        cplx = np.issubdtype(dtype, np.complexfloating)

        # B-inner product: GHEP solvers run B-orthogonal Krylov bases
        Bip: Optional[LinearOperator] = None
        if eps.problem_type in (ProblemType.GHEP, ProblemType.GHIEP) and eps.B is not None:
            Bip = eps.B

        # fully-jitted fast path: standard Hermitian, identity metric,
        # sigma=0 shift or polynomial filter, no constraints/region
        from ..st.st import STShift
        from ..sys.sort import Which
        from .ks_jit import ks_hep_solve

        which_map = {Which.SMALLEST_REAL: "smallest",
                     Which.SMALLEST_MAGNITUDE: "smallest",
                     Which.LARGEST_REAL: "largest",
                     Which.LARGEST_MAGNITUDE: "largest_magnitude"}
        plain_shift = isinstance(st, STShift) and st.sigma == 0 and eps.B is None
        filtered = isinstance(st, STFilter)
        from ..st.sinvert_jit import STSinvertDevice

        # device iterative shift-invert: the diagonal-B symmetrization
        # keeps the identity metric, so the jitted HEP path applies and
        # target-closest eigenvalues are the transform's largest-magnitude
        dev_sinv = isinstance(st, STSinvertDevice)
        bip_fast = None if dev_sinv else Bip
        if (hermitian and bip_fast is None and eps.deflation_space is None
                and eps.rg is None and not indefinite and not use_harmonic
                and (plain_shift or filtered or dev_sinv)
                and (dev_sinv or eps.which in which_map)
                and eps.arbitrary is None and not eps.two_sided):
            if dev_sinv:
                w = "largest_magnitude"
            else:
                w = which_map[eps.which]
            if filtered:
                w = "largest"  # filter maps wanted interval to the top
            if ks_hep_solve(eps, op, w):
                return

        # ---- basis setup (EPSAllocateSolution analog) ----
        V = BV(n, ncv + 1, dtype)
        if Bip is not None:
            V.set_matrix(Bip, indef=indefinite)
        nc = 0
        if eps.deflation_space is not None:
            nc = V.insert_constraints(jnp.asarray(eps.deflation_space, dtype=dtype))
        if eps.initial_space is not None:
            v0 = jnp.asarray(eps.initial_space[:, 0], dtype=dtype)
        else:
            rng = np.random.default_rng(0)
            v0 = jnp.asarray(rng.standard_normal(n), dtype=dtype) if not cplx else \
                jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n), dtype=dtype)
        V.set_column(0, v0)
        V.orthonormalize_column(0, replace_lindep=True)

        H = jnp.zeros((ncv + 1, ncv), dtype=dtype)
        omega = None
        if indefinite:
            omega = jnp.ones(ncv + 1 + nc, dtype=jnp.float64)

        sc = eps.sort_criterion()
        k = 0  # nconv (locked)
        l = 0  # kept from previous restart
        eigs_locked = np.zeros(ncv, dtype=complex)
        err_locked = np.zeros(ncv)
        Tlock = np.zeros((ncv, ncv), dtype=complex if cplx else float)  # locked Schur block
        omega_locked = np.ones(ncv)
        breakdown_ct = 0

        while eps.its < eps.max_it:
            eps.its += 1
            nv = min(k + mpd, ncv)

            # ---- extension: jitted hot loop ----
            V.array, H, beta_j, brk, omega = extend_dispatch(
                op, V.array, H, k + l, nv, nc=nc, Bop=Bip, omega=omega,
                key=None)
            beta = float(beta_j)
            if bool(brk):
                breakdown_ct += 1
                if breakdown_ct > 10:
                    eps.reason = EPSConvergedReason.DIVERGED_BREAKDOWN
                    break

            Hh = np.asarray(H)
            S = Hh[k:nv, k:nv]

            from ..sys.events import log_event

            # ---- projected solve (DS tier, host) ----
            if hermitian and not indefinite:
                Ssym = 0.5 * (S + S.conj().T)
                with log_event("DS_Solve", flops=9.0 * S.shape[0] ** 3):
                    # compact fast path: thick-restart Lanczos leaves S
                    # in arrow+tridiagonal form — plane-rotation arrow
                    # reduction + steqr (reference DSArrowTridiag,
                    # dshep.c:221-261) instead of a dense eigh
                    from ..ds.compact import extract_compact, solve_arrow_hep

                    dce = extract_compact(Ssym)
                    if dce is not None:
                        theta, Q = solve_arrow_hep(*dce)
                        if np.iscomplexobj(Ssym):
                            Q = Q.astype(Ssym.dtype)
                    else:
                        theta, Q = np.linalg.eigh(Ssym)
                theta = theta.astype(complex)
                Tproj = None
            elif indefinite:
                from ..ds.types import DSGHIEP

                om_act = np.asarray(omega)[nc + k: nc + nv]
                theta, Q = DSGHIEP().solve(0.5 * (S + S.conj().T) * 1.0, om_act)
                theta = theta.astype(complex)
                Tproj = None
                if np.iscomplexobj(Q) and np.abs(Q.imag).max() > 1e-10 * max(
                        np.abs(Q.real).max(), 1e-300):
                    # the indefinite pencil has COMPLEX conjugate pairs in
                    # this projection — legitimate for GHIEP, but the
                    # pseudo-Lanczos signature bookkeeping assumes real
                    # spectrum.  Re-solve through the general (GNHEP)
                    # machinery, as the reference sanctions (test18 runs
                    # the same pencil with -eps_gen_non_hermitian and
                    # expects identical output).
                    eps.problem_type = ProblemType.GNHEP
                    eps.st._op = None
                    try:
                        self.solve(eps)
                    finally:
                        eps.problem_type = ProblemType.GHIEP
                    return
            else:
                harmonic = eps.extraction == "harmonic"
                hfac = 1.0
                S_orig = None
                if harmonic:
                    # harmonic Ritz translate (EPS_HARMONIC; reference
                    # DSTranslateHarmonic): solve (S - tau I)^H f = e_last,
                    # S_h = S + beta^2 f e_last^H; Schur/sort happen on S_h
                    # (harmonic values select interior pairs), locking and
                    # restart RECOVER projections of the original S so the
                    # Krylov relation stays exact.
                    tau = 0.0
                    if eps.target is not None:
                        tau = complex(np.asarray(
                            st.eig_map(np.array([eps.target]))).ravel()[0])
                        if not cplx and abs(tau.imag) < 1e-300:
                            tau = tau.real
                    na_h = S.shape[0]
                    e_last = np.zeros(na_h, dtype=S.dtype)
                    e_last[-1] = 1.0
                    try:
                        f = np.linalg.solve(
                            (S - tau * np.eye(na_h)).conj().T, e_last)
                        if beta ** 2 * np.linalg.norm(f) < 1e8:
                            S_orig = S.copy()
                            g_harm = (beta ** 2) * f
                            upd = np.outer(g_harm, e_last)
                            S = S + (upd.real if not np.iscomplexobj(S) else upd)
                            hfac = float(np.sqrt(1.0 + np.linalg.norm(g_harm) ** 2
                                                 / max(beta, 1e-300) ** 2))
                    except np.linalg.LinAlgError:
                        S_orig = None
                with log_event("DS_Solve", flops=25.0 * S.shape[0] ** 3):
                    Tproj, Q, theta = schur(S)

            # ---- sort wanted-first (keys on back-transformed values) ----
            lam_approx = st.back_transform(theta)
            keys = sc.keys(lam_approx)
            if eps.arbitrary is not None:
                # arbitrary-selection functional (reference
                # EPSSetArbitrarySelection, krylovschur.c:35): keys from a
                # user function of the (value, Ritz vector) pair
                if Tproj is None:
                    Yc = Q
                else:
                    _, Yc = np.linalg.eig(Tproj)
                    Yc = Q @ Yc
                Vact_a = np.asarray(V.array[:, nc + k: nc + nv])
                Xc = Vact_a @ Yc
                keys = np.array([float(eps.arbitrary(lam_approx[i], Xc[:, i]))
                                 for i in range(nv - k)])
            if Tproj is None:
                order = np.argsort(keys, kind="stable")
                theta = theta[order]
                Q = Q[:, order]
            else:
                if not cplx:
                    keys = _pair_keys(Tproj, keys)
                Tproj, Q, theta = sort_schur(Tproj, Q, keys)
            lam_approx = st.back_transform(theta)

            # ---- convergence count (EPSKrylovConvergence analog) ----
            na = nv - k  # active size
            last = Q[na - 1, :] if Q.shape[0] == na else Q[-1, :]
            resid = beta * np.abs(last)
            if Tproj is not None and not cplx:
                # complex pairs share the 2-norm of the last row over the pair
                i = 0
                while i < na:
                    if i + 1 < na and Tproj[i + 1, i] != 0.0:
                        r = np.hypot(resid[i], resid[i + 1])
                        resid[i] = resid[i + 1] = r
                        i += 2
                    else:
                        i += 1
            harmonic_on = Tproj is not None and 'S_orig' in dir() and S_orig is not None
            if harmonic_on:
                # per-column residual bound for the harmonic factorization:
                # coupling = beta*v(e^HQ_i) - V Q_{>i}(Q^Hg)_{>i}(e^HQ_i)
                resid = np.abs(last) * float(
                    np.sqrt(beta ** 2 + np.linalg.norm(g_harm) ** 2))
            errest = np.array([eps.conv_measure(theta[i], resid[i]) for i in range(na)])
            if eps.true_residual:
                # EPSSetTrueResidual: confirm candidate convergence with the
                # explicit residual ||A x - lam B x|| on the original problem
                if Tproj is None:
                    Yc = Q
                else:
                    _, Yc = np.linalg.eig(Tproj)
                    Yc = Q @ Yc
                Vact_t = V.array[:, nc + k: nc + nv]
                i = 0
                while i < na and errest[i] < eps.tol:
                    x_i = Vact_t @ jnp.asarray(
                        Yc[:, i].real if not cplx and not np.iscomplexobj(Yc)
                        else Yc[:, i])
                    lam_i = lam_approx[i]
                    r_i = eps.A.mult(x_i)
                    bx = eps.B.mult(x_i) if eps.B is not None else x_i
                    rn = float(jnp.linalg.norm(r_i - lam_i * bx)) / max(
                        float(jnp.linalg.norm(x_i)), 1e-300)
                    errest[i] = eps.conv_measure(lam_i, rn)
                    i += 1
            if eps.rg is not None:
                outside = eps.rg.check_inside(lam_approx) < 0
                errest = np.where(outside, np.inf, errest)

            k2 = k
            while k2 < nv and errest[k2 - k] < eps.tol:
                k2 += 1
            if Tproj is not None and not cplx:
                # don't split a conjugate pair at the lock boundary
                d = k2 - k
                if 0 < d < na and Tproj[d, d - 1] != 0.0:
                    k2 -= 1

            # ---- monitors ----
            all_eigs = np.concatenate([eigs_locked[:k], lam_approx])
            all_err = np.concatenate([err_locked[:k], errest])
            eps.nconv = k2
            eps.monitor(eps, eps.its, k2, all_eigs, all_err)

            # ---- stopping (EPSStoppingBasic) ----
            done = k2 >= nev or eps.its >= eps.max_it
            if eps.stopping is not None:
                done = eps.stopping(eps, eps.its, k2, nev) or done

            # ---- restart size (keep fraction, reference :294) ----
            if done:
                l = 0
            else:
                l = max(1, int(self.keep * (nv - k2)))
                l = min(l, max(nv - k2 - 1, 0))
                if Tproj is not None and not cplx and l > 0:
                    d = k2 - k + l
                    if d < na and Tproj[d, d - 1] != 0.0:
                        l += 1 if d + 1 < na else -1

            kl = (k2 - k) + l  # kept columns of Q

            # ---- lock bookkeeping ----
            for i in range(k2 - k):
                eigs_locked[k + i] = lam_approx[i]
                err_locked[k + i] = errest[i]
            Tuse = Tproj
            if harmonic_on:
                # recovered TRUE projection: T_h - (Q^H g)(e^H Q)
                qg = Q.conj().T @ g_harm
                Tuse = Tproj - np.outer(qg, last)
                if not np.iscomplexobj(Tlock):
                    Tuse = Tuse.real
            if Tproj is not None:
                Tlock[k:k2, k:k2] = Tuse[: k2 - k, : k2 - k]
                # coupling of previously-locked vectors to the newly locked
                # directions: required for eigenVECTOR recovery from the
                # accumulated Schur matrix (dropping it leaves eigenvalues
                # intact but corrupts vectors of non-normal problems)
                Tlock[:k, k:k2] = Hh[:k, k:nv] @ Q[:, : k2 - k]
            else:
                for i in range(k2 - k):
                    Tlock[k + i, k + i] = (theta[i] if np.iscomplexobj(Tlock)
                                           else theta[i].real)
            if indefinite:
                om_act = np.asarray(omega)[nc + k: nc + nv]
                # signature of kept columns: sign of Q^H Omega Q diag
                sig = np.real(np.einsum("ij,i,ij->j", Q.conj(), om_act, Q))
                omega_locked[k:k2] = np.sign(sig[: k2 - k])

            if kl > 0:
                # ---- rotate basis: V[:, k:k+kl] = V[:, k:nv] @ Q[:, :kl] ----
                Qk = jnp.asarray(Q[:, :kl], dtype=dtype if not np.iscomplexobj(Q) else None)
                Vact = V.array[:, nc + k: nc + nv]
                if np.iscomplexobj(Q) and not cplx:
                    # real dtype but complex rotation can't happen: sort_schur
                    # keeps real Schur form, Q stays real
                    raise AssertionError("real Schur rotation must be real")
                with log_event("BV_MultInPlace",
                               flops=2.0 * n * (nv - k) * kl):
                    Vnew = Vact @ Qk
                    V.array = V.array.at[:, nc + k: nc + k + kl].set(Vnew)

                # ---- update H: locked diag + kept block + arrow row ----
                Hh2 = np.zeros_like(Hh)
                Hh2[:nv + 1, :nv] = 0.0
                # locked part
                if cplx or Tproj is None:
                    Hh2[:k2, :k2] = Tlock[:k2, :k2].astype(Hh2.dtype)
                else:
                    Hh2[:k2, :k2] = Tlock[:k2, :k2].real.astype(Hh2.dtype)
                if not done and l > 0:
                    if Tproj is None:
                        for i in range(l):
                            Hh2[k2 + i, k2 + i] = theta[k2 - k + i].real
                    else:
                        blk = Tuse[k2 - k: k2 - k + l, k2 - k: k2 - k + l]
                        Hh2[k2: k2 + l, k2: k2 + l] = blk.real if not cplx else blk
                        coup = Tuse[: k2 - k, k2 - k: k2 - k + l]
                        Hh2[k: k2, k2: k2 + l] = coup.real if not cplx else coup
                        coup0 = Hh[:k, k:nv] @ Q[:, k2 - k: k2 - k + l]
                        Hh2[:k, k2: k2 + l] = coup0.real if not cplx else coup0
                    # arrow row: residual coupling of kept vectors
                    arrow = beta * last[k2 - k: k2 - k + l]
                    Hh2[k2 + l, k2: k2 + l] = arrow.real if not cplx else arrow
                H = jnp.asarray(Hh2, dtype=dtype)

                # ---- move residual vector to column k2 + l ----
                if not done and harmonic_on:
                    # residual-vector update absorbing the dropped coupling:
                    # u_hat = beta*v_res - V(g - Q_kept (Q^H g)_kept); must use
                    # the PRE-rotation basis (reference does BVMultColumn
                    # before BVMultInPlace, krylovschur.c:312-319)
                    c_u = -(g_harm - Q[:, :kl] @ qg[:kl])
                    c_uj = jnp.asarray(c_u.real if not cplx else c_u, dtype=dtype)
                    vres_h = V.array[:, nc + nv]
                    u_hat = beta * vres_h + Vact @ c_uj
                    un = float(jnp.linalg.norm(u_hat))
                    if un > 0:
                        V.array = V.array.at[:, nc + nv].set(u_hat / un)
                        arrow_h = un * last[k2 - k: k2 - k + l]
                        Hh2[k2 + l, k2: k2 + l] = (arrow_h.real if not cplx
                                                   else arrow_h)
                        H = jnp.asarray(Hh2, dtype=dtype)
                if not done:
                    vres = V.array[:, nc + nv]
                    V.array = V.array.at[:, nc + k2 + l].set(vres)
                    if indefinite:
                        om = np.asarray(omega)
                        om2 = om.copy()
                        om2[nc + k: nc + k2] = omega_locked[k:k2]
                        om2[nc + k2 + l] = om[nc + nv]
                        # kept columns' signature
                        om2[nc + k2: nc + k2 + l] = np.sign(sig[k2 - k: k2 - k + l])
                        omega = jnp.asarray(om2)
            k = k2
            if done:
                break

        # ---- finalize (EPSComputeValues / back-transform / vectors) ----
        eps.nconv = k
        eps.V = V
        theta_l = np.array([Tlock[i, i] for i in range(k)], dtype=complex)
        Vl = np.asarray(V.array[:, nc: nc + k])

        if hermitian or indefinite or k == 0:
            X = Vl.astype(complex) if np.iscomplexobj(theta_l) and not cplx else Vl
            lam = st.back_transform(theta_l)
        else:
            # eigenvectors from locked Schur block
            Tb = Tlock[:k, :k]
            w, Y = np.linalg.eig(Tb) if k else (np.zeros(0), np.zeros((0, 0)))
            # keep locked order: match each locked theta to an eig of Tb
            lam = st.back_transform(w)
            X = Vl @ Y
            nrm = np.linalg.norm(X, axis=0)
            nrm[nrm == 0] = 1
            X = X / nrm
        if getattr(st, "requires_rayleigh", False) and k > 0:
            # filtered run: recover Rayleigh quotients on the original A
            lam = _rayleigh_values(eps, X)
            order = np.argsort(lam.real)
            lam = lam[order]
            X = X[:, order]
            err_locked[:k] = err_locked[:k][order]

        if balance_d is not None and k > 0:
            X = np.asarray(X) * balance_d[:, None]
            nrmb = np.linalg.norm(X, axis=0)
            nrmb[nrmb == 0] = 1
            X = X / nrmb
        eps.eigenvalues = np.asarray(lam)
        eps.errests = err_locked[:k].copy()
        eps._eigenvectors = np.asarray(X)
        if eps.eigenvalues.size and np.all(np.abs(eps.eigenvalues.imag) < 1e-14):
            if hermitian:
                eps.eigenvalues = eps.eigenvalues.real


def _pair_keys(T: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Equalize sort keys within 2x2 blocks so pairs move together."""
    keys = keys.copy()
    i = 0
    n = T.shape[0]
    while i < n:
        if i + 1 < n and T[i + 1, i] != 0.0:
            kk = min(keys[i], keys[i + 1])
            keys[i] = keys[i + 1] = kk
            i += 2
        else:
            i += 1
    return keys


def _rayleigh_values(eps: EPS, X: np.ndarray) -> np.ndarray:
    Xj = jnp.asarray(X)
    AX = eps.A.mult(Xj)
    num = np.asarray(jnp.sum(Xj.conj() * AX, axis=0))
    if eps.B is not None:
        BX = eps.B.mult(Xj)
        den = np.asarray(jnp.sum(Xj.conj() * BX, axis=0))
    else:
        den = np.asarray(jnp.sum(jnp.abs(Xj) ** 2, axis=0))
    return num / den


EPS.register("krylovschur", KrylovSchur)
