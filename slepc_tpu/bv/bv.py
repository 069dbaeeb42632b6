"""BV — a distributed block of basis vectors.

The reference's single most performance-critical class (reference:
src/sys/classes/bv/, struct _p_BV include/slepc/private/bvimpl.h:63-113):
an n x m dense block of column vectors, row-distributed, with an active
column window [l, k), optional leading constraint columns (deflation
spaces), an optional B inner product, and an optional indefinite signature
omega.

TPU design: one ``jax.Array`` of shape (n, m) sharded on rows; all block
operations are GEMMs on the MXU; all inner products reduce with a single
psum (inserted by XLA from the sharding).  The class is a thin mutable
handle over the immutable array — solvers treat methods as commands, hot
loops operate on the raw array with the jittable kernels in
``slepc_tpu.bv.orthog`` / ``slepc_tpu.bv.krylov``.

Column indexing convention: the visible columns 0..m-1 exclude constraints;
constraints occupy ``nc`` physical leading columns, exactly like the
reference (bvimpl.h nc handling).
"""

from __future__ import annotations

import enum
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sys.mesh import device_put_rows
from . import orthog as _orth


class OrthogType(enum.Enum):
    CGS = "cgs"
    MGS = "mgs"


class OrthogRefine(enum.Enum):
    IFNEEDED = "ifneeded"
    NEVER = "never"
    ALWAYS = "always"


class OrthogBlockType(enum.Enum):
    GS = "gs"  # column loop
    CHOL = "chol"  # CholeskyQR2
    TSQR = "tsqr"
    SVQB = "svqb"


class BV:
    def __init__(self, n: int, m: int, dtype=jnp.float64, nc: int = 0, array=None):
        self.n = n
        self.m = m
        self.nc = nc
        self.dtype = np.dtype(dtype)
        if array is not None:
            self.array = array
        else:
            self.array = device_put_rows(jnp.zeros((n, m + nc), dtype=dtype))
        self.l = 0
        self.k = m
        self.matrix = None  # B inner-product LinearOperator
        self.indef = False
        self.omega: Optional[jnp.ndarray] = None  # (m+nc,) signature
        self.orthog_type = OrthogType.CGS
        self.orthog_refine = OrthogRefine.IFNEEDED
        self.orthog_eta = _orth.ETA
        self.orthog_block = OrthogBlockType.CHOL

    # -- basic ------------------------------------------------------------
    def copy(self) -> "BV":
        other = BV(self.n, self.m, self.dtype, self.nc, array=self.array)
        other.l, other.k = self.l, self.k
        other.matrix, other.indef = self.matrix, self.indef
        other.omega = self.omega
        other.orthog_type = self.orthog_type
        other.orthog_refine = self.orthog_refine
        other.orthog_block = self.orthog_block
        return other

    def set_active_columns(self, l: int, k: int) -> None:
        assert 0 <= l <= k <= self.m
        self.l, self.k = l, k

    def set_matrix(self, B, indef: bool = False) -> None:
        """Set the inner-product matrix (x, y) = y^H B x (reference BVSetMatrix)."""
        self.matrix = B
        self.indef = indef
        if indef and self.omega is None:
            self.omega = jnp.ones(self.m + self.nc, dtype=jnp.float64)

    def _ip_mult(self):
        """The metric application closure (identity when no B)."""
        B = self.matrix
        return None if B is None else (lambda x: B.mult(x))

    # -- column access (logical index excludes constraints) ---------------
    def _phys(self, j: int) -> int:
        return j + self.nc

    def get_column(self, j: int) -> jnp.ndarray:
        return self.array[:, self._phys(j)]

    def set_column(self, j: int, v) -> None:
        self.array = self.array.at[:, self._phys(j)].set(v)

    def insert_vec(self, j: int, v) -> None:
        self.set_column(j, v)

    def insert_vecs(self, s: int, W) -> None:
        W = jnp.asarray(W)
        self.array = self.array.at[:, self._phys(s): self._phys(s) + W.shape[1]].set(W)

    def insert_constraints(self, C) -> int:
        """Prepend constraint columns (deflation space); they are
        orthonormalized and participate in every orthogonalization but are
        never touched by solvers (reference BVInsertConstraints)."""
        C = jnp.asarray(C)
        nc_new = C.shape[1]
        Q, _ = _orth.cholqr2(C, self._ip_mult())
        arr = jnp.concatenate([Q, self.array], axis=1)
        self.nc += nc_new
        self.array = arr
        if self.omega is not None:
            self.omega = jnp.concatenate(
                [jnp.ones(nc_new, dtype=self.omega.dtype), self.omega])
        return self.nc

    def set_random(self, seed: int = 0, j: Optional[int] = None) -> None:
        """Deterministic random fill (reference: BVSetRandom with rrandom)."""
        rng = np.random.default_rng(seed)
        if j is None:
            vals = rng.standard_normal((self.n, self.m)).astype(self.dtype, copy=False)
            if np.issubdtype(self.dtype, np.complexfloating):
                vals = vals + 1j * rng.standard_normal((self.n, self.m))
            self.array = self.array.at[:, self.nc:].set(jnp.asarray(vals, dtype=self.dtype))
        else:
            vals = rng.standard_normal(self.n)
            if np.issubdtype(self.dtype, np.complexfloating):
                vals = vals + 1j * rng.standard_normal(self.n)
            self.set_column(j, jnp.asarray(vals, dtype=self.dtype))

    def resize(self, m_new: int) -> None:
        arr = self.array
        phys_new = m_new + self.nc
        if phys_new <= arr.shape[1]:
            self.array = arr[:, :phys_new]
        else:
            pad = jnp.zeros((self.n, phys_new - arr.shape[1]), dtype=arr.dtype)
            self.array = jnp.concatenate([arr, pad], axis=1)
        self.m = m_new
        self.k = min(self.k, m_new)
        self.l = min(self.l, self.k)

    # -- block linear algebra ---------------------------------------------
    def mult_vec(self, q) -> jnp.ndarray:
        """y = V[:, :len(q)] @ q (reference BVMultVec)."""
        q = jnp.asarray(q, dtype=self.dtype)
        cols = self.array[:, self.nc: self.nc + q.shape[0]]
        return cols @ q

    def mult_in_place(self, Q, s: Optional[int] = None, e: Optional[int] = None) -> None:
        """V[:, s:e] = V[:, :q_rows] @ Q[:, s:e] — the restart compaction GEMM
        (reference BVMultInPlace, bvops.c:220; 2nd hottest op)."""
        Q = jnp.asarray(Q, dtype=self.dtype)
        s = self.l if s is None else s
        e = self.k if e is None else e
        rows = Q.shape[0]
        Vact = self.array[:, self.nc: self.nc + rows]
        Vnew = Vact @ Q[:, s:e]
        self.array = self.array.at[:, self._phys(s): self._phys(e)].set(Vnew)

    def mult(self, alpha, beta, X: "BV", Q) -> None:
        """self = beta*self + alpha * X @ Q on active windows (BVMult)."""
        Q = jnp.asarray(Q, dtype=self.dtype)
        Xa = X.array[:, X._phys(0): X._phys(Q.shape[0])]
        tgt = self.array[:, self._phys(self.l): self._phys(self.k)]
        upd = beta * tgt + alpha * (Xa @ Q[:, self.l: self.k])
        self.array = self.array.at[:, self._phys(self.l): self._phys(self.k)].set(upd)

    def mat_mult(self, A, out: Optional["BV"] = None) -> "BV":
        """Y = A @ V over active columns (reference BVMatMult, vmm=MatMatMult
        mode — one fused SpMM rather than a column loop)."""
        Vact = self.array[:, self._phys(self.l): self._phys(self.k)]
        Y = A.mult(Vact)
        if out is None:
            out = BV(self.n, self.m, self.dtype, 0)
        out.array = out.array.at[:, out._phys(self.l): out._phys(self.k)].set(Y)
        out.set_active_columns(self.l, self.k)
        return out

    def dot(self, Y: "BV") -> jnp.ndarray:
        """M = Y^H * B * X over active cols: returns (ky, kx) (BVDot)."""
        Xa = self.array[:, self._phys(0): self._phys(self.k)]
        if self.matrix is not None:
            Xa = self.matrix.mult(Xa)
        Ya = Y.array[:, Y._phys(0): Y._phys(Y.k)]
        return Ya.conj().T @ Xa

    def dot_vec(self, y) -> jnp.ndarray:
        """c = V^H B y over active columns (BVDotVec); one reduction."""
        y = jnp.asarray(y)
        By = y if self.matrix is None else self.matrix.mult(y)
        cols = self.array[:, self._phys(0): self._phys(self.k)]
        return cols.conj().T @ By

    def norm_column(self, j: int) -> float:
        v = self.get_column(j)
        Bv = v if self.matrix is None else self.matrix.mult(v)
        nsq = jnp.vdot(v, Bv)
        return float(np.real(nsq)) ** 0.5 if not self.indef else float(np.real(nsq))

    def scale_column(self, j: int, alpha) -> None:
        self.set_column(j, self.get_column(j) * alpha)

    def scale(self, alpha) -> None:
        sl = slice(self._phys(self.l), self._phys(self.k))
        self.array = self.array.at[:, sl].multiply(alpha)

    def norms(self) -> jnp.ndarray:
        """Column norms of active window, fused in one reduction
        (the VECCOMP reduced-communication idea — reference
        src/sys/vec/veccomp.c — is free here: one psum for all columns)."""
        cols = self.array[:, self._phys(self.l): self._phys(self.k)]
        return jnp.sqrt(jnp.sum(jnp.abs(cols) ** 2, axis=0))

    # -- orthogonalization -------------------------------------------------
    def _mask_upto(self, j: int) -> jnp.ndarray:
        """Mask over physical columns selecting constraints + columns < j."""
        mphys = self.array.shape[1]
        return (jnp.arange(mphys) < self._phys(j)).astype(
            jnp.float64 if not np.issubdtype(self.dtype, np.complexfloating) else self.dtype
        )

    def orthogonalize_vec(self, v) -> Tuple[jnp.ndarray, jnp.ndarray, float, bool]:
        """Orthogonalize an external vector against all active columns.

        Returns (v_new, coeffs (logical cols), norm_after, lindep).
        """
        return self._orth_against(self.k, jnp.asarray(v, dtype=self.dtype))

    def orthogonalize_column(self, j: int):
        """Orthogonalize column j against constraints + columns 0..j-1
        (reference BVOrthogonalizeColumn, bvorthog.c:315)."""
        v = self.get_column(j)
        v_new, c, norm, lindep = self._orth_against(j, v)
        self.set_column(j, v_new)
        return c, norm, lindep

    def orthonormalize_column(self, j: int, replace_lindep: bool = False):
        """Orthogonalize + normalize column j (BVOrthonormalizeColumn).

        On linear dependence: if replace_lindep, substitute a fresh random
        vector and re-orthogonalize (breakdown restart semantics,
        reference krylovschur.c:298-307 handles this at solver level)."""
        c, norm, lindep = self.orthogonalize_column(j)
        if lindep and replace_lindep:
            self.set_random(seed=j + 12345, j=j)
            c2, norm, lindep = self.orthogonalize_column(j)
        if self.indef:
            sign = 1.0 if norm >= 0 else -1.0
            self.omega = self.omega.at[self._phys(j)].set(sign)
            self.scale_column(j, 1.0 / (abs(norm) if norm != 0 else 1.0))
        else:
            self.scale_column(j, 1.0 / (norm if norm != 0 else 1.0))
        return c, norm, lindep

    def _orth_against(self, j: int, v):
        passes = 1 if self.orthog_refine == OrthogRefine.NEVER else 2
        mask = self._mask_upto(j)
        omega = None
        if self.indef:
            omega = self.omega
        if self.orthog_type == OrthogType.MGS:
            v_new, c, nb, na = _mgs_orth(self.array, mask, v, self._ip_mult(), omega, passes)
        else:
            v_new, c, nb, na = _orth.orthogonalize_vec(
                self.array, mask, v, self._ip_mult(), omega, passes=passes)
        na_f = float(np.real(na))
        nb_f = float(np.real(nb))
        # linear dependence: post-orth norm below eta * pre-orth norm even
        # after refinement (reference bvorthog.c:174-203 lindep criterion)
        lindep = abs(na_f) < max(abs(nb_f), 1e-300) * (
            jnp.finfo(self.dtype).eps ** 0.5 if not self.indef else 1e-7)
        c_log = c[self.nc:self.nc + self.m]
        return v_new, c_log, na_f, bool(lindep)

    def orthogonalize(self, block_type: Optional[OrthogBlockType] = None):
        """Orthonormalize all active columns as a block (BVOrthogonalize,
        bvorthog.c:726).  Returns R with V_old = V_new @ R."""
        bt = block_type or self.orthog_block
        sl = slice(self._phys(self.l), self._phys(self.k))
        X = self.array[:, sl]
        Bmult = self._ip_mult()
        if bt == OrthogBlockType.CHOL:
            Q, R = _orth.cholqr2(X, Bmult)
        elif bt == OrthogBlockType.TSQR:
            if Bmult is not None:
                Q, R = _orth.cholqr2(X, Bmult)
            else:
                Q, R = _orth.tsqr(X)
        elif bt == OrthogBlockType.SVQB:
            Q, R = _orth.svqb(X, Bmult, self.omega[sl] if self.indef else None)
        elif bt == OrthogBlockType.GS:
            Q, R = _orth.mgs_block(X, Bmult)
        else:
            raise ValueError(bt)
        self.array = self.array.at[:, sl].set(Q)
        return R

    # -- projections --------------------------------------------------------
    def mat_project(self, A, W: Optional["BV"] = None) -> jnp.ndarray:
        """M = W^H A V on active columns (reference BVMatProject,
        bvglobal.c:1093); one SpMM + one GEMM + one psum."""
        W = W if W is not None else self
        Vact = self.array[:, self._phys(0): self._phys(self.k)]
        AV = A.mult(Vact) if A is not None else Vact
        Wact = W.array[:, W._phys(0): W._phys(W.k)]
        return Wact.conj().T @ AV

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.array[:, self.nc:])


def _mgs_orth(V, mask, v, Bmult, omega, passes):
    """Modified GS against masked columns — column loop, one reduction per
    column; robustness fallback (BV_ORTHOG_TYPE_MGS, bvorthog.c:52)."""
    mphys = V.shape[1]
    Bv = v if Bmult is None else Bmult(v)
    nb = _orth._safe_sqrt(jnp.vdot(v, Bv))
    c_tot = jnp.zeros(mphys, dtype=V.dtype)

    def one_pass(v, c_tot):
        def body(i, state):
            v, c_tot = state
            col = V[:, i]
            Bv_i = v if Bmult is None else Bmult(v)
            ci = jnp.vdot(col, Bv_i) * mask[i]
            hi = ci if omega is None else ci * omega[i]
            v = v - col * hi
            return v, c_tot.at[i].add(ci)

        return jax.lax.fori_loop(0, mphys, body, (v, c_tot))

    for _ in range(passes):
        v, c_tot = one_pass(v, c_tot)
    Bv = v if Bmult is None else Bmult(v)
    na = _orth._safe_sqrt(jnp.vdot(v, Bv))
    return v, c_tot, nb, na


def biorthogonalize_column(V: "BV", W: "BV", j: int):
    """Two-sided (bi)orthogonalization: make W[:,j] satisfy
    (W[:,i], V[:,j']) = delta for previous columns — the two-sided Lanczos
    primitive (reference BVBiorthogonalizeColumn, bvbiorthog.c).

    CGS2-style with the cross basis; returns the normalization factor
    (w, v) whose sign/magnitude feeds the two-sided recurrence.
    """
    import jax.numpy as jnp

    v = V.get_column(j)
    w = W.get_column(j)
    for _ in range(2):
        if j > 0:
            Wprev = W.array[:, W._phys(0): W._phys(j)]
            Vprev = V.array[:, V._phys(0): V._phys(j)]
            v = v - Vprev @ (Wprev.conj().T @ v)
            w = w - Wprev @ (Vprev.conj().T @ w)
    delta = jnp.vdot(w, v)
    V.set_column(j, v)
    W.set_column(j, w)
    return delta
