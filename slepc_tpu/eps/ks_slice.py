"""Spectrum slicing: all eigenvalues in an interval (EPS_ALL).

Reference: src/eps/impls/krylov/krylovschur/ks-slice.c (1,331 LoC):
shift-and-invert Krylov-Schur runs at a moving shift, with *matrix inertia*
at strategic points certifying that no eigenvalue is missed (inertia =
number of eigenvalues below sigma, read off the LDL^T factorization —
EPSSliceGetInertia, ks-slice.c:227-258); the interval is bisected until
every subinterval's census matches the eigenvalues found.

Factorization economy (the reference reuses the ST factorization at each
shift for both inertia and the subsequent solves, ks-slice.c:227-258):
a per-run ``_ShiftFactorCache`` factorizes A - sigma*B ONCE per distinct
shift, serves the inertia certificate off the LDL^T, and hands the same
object to the sub-solver's STSinvert as its KSP.  Every factorization is
logged as the named event ``Slice_Factorization`` (sys/events) so runs
can audit the count.

The reference also distributes subintervals over subcommunicators
(npart, ks-slice.c:341-416); here each partition is pinned to its own
device sub-mesh (parallel/tasks.py slice_submeshes) so device work
overlaps across partitions, while the host-factorization tier overlaps
on a thread pool (factorization kernels release the GIL).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..ksp.ksp import KSP
from ..mat.linop import AIJOperator, DenseOperator
from ..st.st import STSinvert
from ..sys.events import log_event
from ..sys.sort import Which
from .base import EPS, EPSConvergedReason


class _ShiftFactorCache:
    """sigma -> factorized KSP on (A - sigma B), with inertia.

    One factorization per distinct shift serves BOTH the inertia
    certificate and the sinvert inner solves; probes are memoized so the
    npart boundary search and the bisection worklist never re-factor a
    shift they have already visited."""

    def __init__(self, eps: EPS):
        self.eps = eps
        self._ksp: Dict[float, KSP] = {}
        self._inertia: Dict[float, int] = {}
        self.factorizations = 0
        import threading

        self._lock = threading.Lock()

    def _shifted_op(self, sigma: float):
        import scipy.sparse as sp

        from ..mat.linop import DIAOperator

        A, B = self.eps.A, self.eps.B
        if (isinstance(A, DIAOperator)
                and not np.issubdtype(np.dtype(A.dtype),
                                      np.complexfloating)
                and (B is None or (isinstance(B, DIAOperator)
                                   and B.offsets == (0,)))):
            # keep the DIA structure so DirectSolver routes tridiagonal
            # (scan) / banded (block-tridiagonal scan) operators to the
            # on-device LDL^T backends; anything else degrades to the
            # host ldl/splu tier exactly as before
            dd = np.asarray(A.diags).copy()
            i0 = A.offsets.index(0)
            if B is None:
                dd[i0] = dd[i0] - sigma
            else:
                dd[i0] = dd[i0] - sigma * np.asarray(B.diags[0])
            return DIAOperator(A.offsets, dd)
        As = self.eps.A.to_scipy()
        if self.eps.B is not None:
            S = As - sigma * self.eps.B.to_scipy()
        elif sp.issparse(As):
            S = As - sigma * sp.eye(As.shape[0], format="csr")
        else:
            S = As - sigma * np.eye(As.shape[0])
        if sp.issparse(S):
            return AIJOperator.from_scipy(sp.csr_matrix(S))
        return DenseOperator(S)

    def ksp(self, sigma: float) -> KSP:
        with self._lock:
            k = self._ksp.get(sigma)
        if k is not None:
            return k
        with log_event("Slice_Factorization"):
            k = KSP(self._shifted_op(sigma), method="direct")
            if not k._direct._factored:
                k._direct._factor()
        with self._lock:
            self._ksp[sigma] = k
            self.factorizations += 1
        return k

    def inertia(self, sigma: float) -> int:
        """Eigenvalues of (A, B) below sigma (B spd or identity)."""
        with self._lock:
            v = self._inertia.get(sigma)
        if v is not None:
            return v
        k = self.ksp(sigma)
        neg, zero, pos = k._direct.inertia()
        if zero:
            # shift hit an eigenvalue: perturb (reference ks-slice.c:243-247)
            return self.inertia(sigma * (1 + 1e-8) + 1e-12)
        with self._lock:
            self._inertia[sigma] = neg
        return neg


def _process_interval(eps: EPS, cache: _ShiftFactorCache,
                      a: float, b: float, total: int):
    """Inertia-certified bisection worklist for one partition; returns
    (lams, errs, Xs, its) for the eigenvalues found inside [a, b]."""
    found_lam: List[float] = []
    found_err: List[float] = []
    found_X: List[np.ndarray] = []
    its_total = 0
    stack: List[Tuple[float, float, int]] = [(a, b, total)]
    guard = 0
    while stack and guard < 4 * total + 20:
        guard += 1
        lo, hi, cnt = stack.pop()
        if cnt <= 0:
            continue
        sigma = 0.5 * (lo + hi)
        sub = EPS(eps.A, eps.B,
                  problem_type=eps.problem_type.value,
                  nev=min(cnt, max(2, cnt)), tol=eps.tol,
                  ncv=min(eps.n, max(2 * cnt + 4, 16)))
        sub.set_target(sigma)
        sub.which = Which.TARGET_MAGNITUDE
        # the shift's cached factorization doubles as the sinvert KSP
        mats = [eps.A] if eps.B is None else [eps.A, eps.B]
        sub.set_st(STSinvert(mats, sigma=sigma, hermitian=eps.B is None,
                             ksp=cache.ksp(sigma)))
        sub.solve()
        its_total += sub.its
        for i in range(sub.nconv):
            lam_i = float(np.real(sub.eigenvalues[i]))
            if lo - 1e-12 <= lam_i <= hi + 1e-12:
                if all(abs(lam_i - f) > max(1e-10, eps.tol * 10 * max(1, abs(lam_i)))
                       for f in found_lam):
                    found_lam.append(lam_i)
                    found_err.append(float(sub.errests[i])
                                     if i < len(sub.errests) else 0.0)
                    found_X.append(np.asarray(sub._eigenvectors[:, i]))
        # census check: how many in (lo, hi) are now found?
        n_found = sum(1 for f in found_lam if lo - 1e-12 <= f <= hi + 1e-12)
        if n_found < cnt:
            # bisect at sigma with inertia certificates (memoized)
            isig = cache.inertia(sigma)
            cl = isig - cache.inertia(lo)
            ch = cnt - cl
            nf_l = sum(1 for f in found_lam if lo - 1e-12 <= f <= sigma)
            nf_h = sum(1 for f in found_lam if sigma < f <= hi + 1e-12)
            if hi - lo < 1e-10 * max(1.0, abs(a), abs(b)):
                continue  # give up on a degenerate sliver (multiplicities)
            if cl - nf_l > 0:
                stack.append((lo, sigma, cl))
            if ch - nf_h > 0:
                stack.append((sigma, hi, ch))
    return found_lam, found_err, found_X, its_total


def slice_solve(eps: EPS) -> None:
    """Compute ALL eigenvalues in eps.interval by inertia-certified
    bisection with shift-and-invert Krylov-Schur runs.

    With ``eps.slice_npart = p > 1`` the interval splits into p
    inertia-balanced partitions processed concurrently on a thread pool
    — the reference's subcommunicator partitions (ks-slice.c npart,
    EPSKrylovSchurSetPartitions) on the host-factorization tier."""
    a, b = eps.interval
    cache = _ShiftFactorCache(eps)
    ia, ib = cache.inertia(a), cache.inertia(b)
    total = ib - ia
    if total <= 0:
        eps.nconv = 0
        eps.eigenvalues = np.array([])
        eps.errests = np.array([])
        eps._eigenvectors = np.zeros((eps.n, 0), dtype=eps.A.dtype)
        eps.reason = EPSConvergedReason.CONVERGED_TOL
        return

    npart = int(getattr(eps, "slice_npart", 1) or 1)
    npart = max(1, min(npart, total))
    if npart == 1:
        parts = [(a, b, total)]
    else:
        # inertia-balanced partition boundaries: bisection for the points
        # where the census reaches i*total/npart.  ~12 probe levels give
        # count-resolution boundaries; every probe is memoized, and probed
        # shifts seed the per-partition solves' factor cache.
        bounds = [a]
        counts = []
        prev_i = ia
        for i in range(1, npart):
            want = ia + (i * total) // npart
            lo_b, hi_b = bounds[-1], b
            for _ in range(12):
                mid = 0.5 * (lo_b + hi_b)
                if cache.inertia(mid) < want:
                    lo_b = mid
                else:
                    hi_b = mid
                if cache.inertia(hi_b) == want and hi_b - lo_b < 0.25 * (b - a) / npart:
                    break
            bounds.append(hi_b)
            counts.append(cache.inertia(hi_b) - prev_i)
            prev_i = cache.inertia(hi_b)
        bounds.append(b)
        counts.append(ib - prev_i)
        parts = [(bounds[i], bounds[i + 1], counts[i])
                 for i in range(npart) if counts[i] > 0]

    from ..parallel.tasks import slice_submeshes, thread_map_submesh

    # each partition runs on its own device sub-mesh when several devices
    # are visible (the reference's npart subcommunicators,
    # ks-slice.c:341-416); host factorizations overlap on the thread pool
    results = thread_map_submesh(lambda p: _process_interval(eps, cache, *p),
                                 parts, meshes=slice_submeshes(len(parts)))

    found_lam: List[float] = []
    found_err: List[float] = []
    found_X: List[np.ndarray] = []
    its_total = 0
    for lams, errs, Xs, its in results:
        its_total += its
        for lam_i, err_i, x_i in zip(lams, errs, Xs):
            if all(abs(lam_i - f) > max(1e-10, eps.tol * 10 * max(1, abs(lam_i)))
                   for f in found_lam):
                found_lam.append(lam_i)
                found_err.append(err_i)
                found_X.append(x_i)

    order = np.argsort(found_lam)
    eps.its = its_total
    eps.nconv = len(found_lam)
    eps.slice_factorizations = cache.factorizations
    eps.eigenvalues = np.asarray(found_lam)[order] if found_lam else np.array([])
    eps.errests = np.asarray(found_err)[order] if found_err else np.array([])
    eps._eigenvectors = (np.stack(found_X, axis=1)[:, order] if found_X
                         else np.zeros((eps.n, 0), dtype=eps.A.dtype))
    eps.reason = (EPSConvergedReason.CONVERGED_TOL
                  if eps.nconv >= total else EPSConvergedReason.DIVERGED_ITS)
