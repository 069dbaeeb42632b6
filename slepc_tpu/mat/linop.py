"""Linear operators — the Mat tier, TPU-native.

The reference builds on PETSc Mat (MPIAIJ CSR with VecScatter halo SpMV) and
"shell" matrices defined by callbacks.  Here an operator is a pytree class
with a ``mult`` method usable inside ``jax.jit``; distributed operation
comes from sharded constituent arrays, with XLA inserting the halo/gather
collectives that PETSc performs explicitly.

Formats (chosen for the TPU memory system, not translated from CSR):
  * DenseOperator — small/projected problems; plain GEMM on the MXU.
  * DIAOperator — diagonal-offset storage; SpMV is a handful of
    shift+multiply-add streams (speed-of-light HBM traffic for stencil /
    banded matrices such as the Laplacian test suite).
  * AIJOperator — general sparsity as padded ELL (row-aligned gather+FMA),
    the TPU-friendly reshaping of CSR.
  * ShellOperator — user callbacks, the analog of MATSHELL
    (reference: src/sys/classes/st/interface/stsolve.c shell usage).
Operator algebra (aA + bB, A@B, A - sigma*B, adjoint) builds the ST
transformed operators compositionally.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class


def _as2d(x):
    """Internal: lift (n,) to (n,1); return (arr2d, was_1d)."""
    if x.ndim == 1:
        return x[:, None], True
    return x, False


class LinearOperator:
    """Abstract operator A: C^n -> C^m.

    ``mult(x)``   computes A @ x for x of shape (n,) or (n, k).
    ``mult_h(x)`` computes A^H @ x (Hermitian transpose).
    """

    shape: Tuple[int, int]
    dtype: np.dtype

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def nnz(self) -> int:
        """Nonzero count for flop accounting (dense ≙ m*n)."""
        return self.shape[0] * self.shape[1]

    def mult(self, x):
        raise NotImplementedError

    def mult_h(self, x):
        raise NotImplementedError

    def __call__(self, x):
        return self.mult(x)

    # ---- operator algebra ----------------------------------------------
    def __add__(self, other: "LinearOperator") -> "LinearOperator":
        return SumOperator((self, other), (1.0, 1.0))

    def __sub__(self, other: "LinearOperator") -> "LinearOperator":
        return SumOperator((self, other), (1.0, -1.0))

    def __mul__(self, alpha) -> "LinearOperator":
        return ScaledOperator(self, alpha)

    __rmul__ = __mul__

    def __neg__(self) -> "LinearOperator":
        return ScaledOperator(self, -1.0)

    def __matmul__(self, other: "LinearOperator") -> "LinearOperator":
        return ProductOperator((self, other))

    @property
    def H(self) -> "LinearOperator":
        return AdjointOperator(self)

    def shifted(self, sigma, B: Optional["LinearOperator"] = None) -> "LinearOperator":
        """A - sigma*B (B=None ≙ identity): the ST building block."""
        if sigma == 0:
            return self
        if B is None:
            B = IdentityOperator(self.n, self.dtype)
        return SumOperator((self, B), (1.0, -sigma))

    def norm_estimate(self) -> float:
        """Cheap Frobenius-norm estimate (backward-error weights)."""
        if self.shape[0] > 4096:
            return norm_estimate_randomized(self)
        try:
            return float(np.linalg.norm(np.asarray(self.to_dense())))
        except Exception:
            return norm_estimate_randomized(self)

    # ---- conversions ----------------------------------------------------
    def to_dense(self) -> jnp.ndarray:
        """Materialize as a dense array (testing / small problems only)."""
        eye = jnp.eye(self.n, dtype=self.dtype)
        return _as2d(self.mult(eye))[0]

    def to_scipy(self):
        """Host scipy sparse view if available, else dense ndarray."""
        return np.asarray(self.to_dense())


@register_pytree_node_class
class DenseOperator(LinearOperator):
    """A dense matrix; mult is a GEMM (MXU)."""

    def __init__(self, A):
        self.A = jnp.asarray(A)
        self.shape = tuple(self.A.shape)
        self.dtype = self.A.dtype

    def mult(self, x):
        x2, was1 = _as2d(x)
        y = self.A @ x2
        return y[:, 0] if was1 else y

    def mult_h(self, x):
        x2, was1 = _as2d(x)
        y = self.A.conj().T @ x2
        return y[:, 0] if was1 else y

    def to_dense(self):
        return self.A

    def to_scipy(self):
        return np.asarray(self.A)

    def tree_flatten(self):
        return (self.A,), (self.shape, str(self.dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.A = children[0]
        obj.shape, _ = aux
        obj.dtype = getattr(obj.A, "dtype", np.dtype(aux[1]))
        return obj


@register_pytree_node_class
class IdentityOperator(LinearOperator):
    def __init__(self, n: int, dtype=jnp.float64):
        self.shape = (n, n)
        self.dtype = np.dtype(dtype)

    @property
    def nnz(self):
        return self.n

    def mult(self, x):
        return x

    mult_h = mult

    def tree_flatten(self):
        return (), (self.shape[0], str(self.dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], np.dtype(aux[1]))


@register_pytree_node_class
class DIAOperator(LinearOperator):
    """Diagonal-offset (DIA) sparse storage for stencil/banded matrices.

    y[i] = sum_d diags[d][i] * x[i + offsets[d]], with out-of-range
    entries pre-zeroed in ``diags`` so a circular shift is safe.  On a row
    mesh each shift lowers to an XLA collective-permute of only the halo,
    making this the speed-of-light format for Laplacian-class operators
    (the role PETSc's MPIAIJ+VecScatter plays in the reference's examples,
    e.g. src/eps/tutorials/ex1.c).
    """

    def __init__(self, offsets: Sequence[int], diags, shape=None, dp=None):
        self.offsets = tuple(int(o) for o in offsets)
        self.diags = jnp.asarray(diags)  # (ndiag, n)
        n = self.diags.shape[1]
        self.shape = tuple(shape) if shape is not None else (n, n)
        self.dtype = self.diags.dtype
        # Pallas-kernel data: prepared eagerly at (host-side) construction
        # so it rides the pytree through jit traces
        self.dp = dp
        if dp is None and self._pallas_applicable():
            from ..ops.dia_pallas import prepare_diags

            self.dp = prepare_diags(self.diags, self.shape[0])

    def _pallas_applicable(self) -> bool:
        import jax as _jax

        from ..ops.dia_pallas import dia_spmv_supported

        try:
            if isinstance(self.diags, _jax.core.Tracer):
                return False
            if len(_jax.devices()) != 1:
                return False
        except Exception:
            return False
        return dia_spmv_supported(self.offsets, self.shape[0], self.dtype)

    @property
    def nnz(self):
        # exact: padding entries in diags are zero but stored; report the
        # true nonzero budget for flop/byte accounting
        n = self.shape[0]
        return int(sum(n - abs(o) for o in self.offsets))

    def norm_estimate(self) -> float:
        import jax.numpy as _jnp

        return float(_jnp.linalg.norm(self.diags))

    def mult(self, x):
        if x.ndim == 1 and self.dp is not None:
            from ..ops.dia_pallas import dia_spmv_prepared

            return dia_spmv_prepared(self.offsets, self.dp, x, self.shape[0])
        x2, was1 = _as2d(x)
        y = jnp.zeros_like(x2)
        for off, d in zip(self.offsets, self.diags):
            # y[i] += d[i] * x[i+off]  ==  d * roll(x, -off)
            y = y + d[:, None] * jnp.roll(x2, -off, axis=0)
        return y[:, 0] if was1 else y

    def mult_h(self, x):
        x2, was1 = _as2d(x)
        y = jnp.zeros_like(x2)
        for off, d in zip(self.offsets, self.diags):
            # (A^H x)[j] = sum_i conj(A[i,j]) x[i]; A[i, i+off]=d[i]
            # => y[i+off] += conj(d[i]) * x[i]  ==  roll(conj(d)*x, +off)
            y = y + jnp.roll(d.conj()[:, None] * x2, off, axis=0)
        return y[:, 0] if was1 else y

    def to_scipy(self):
        import scipy.sparse as sp

        n = self.shape[0]
        d = np.asarray(self.diags)
        # scipy dia_matrix uses data[k, i] = A[i - offset[k], i] (column index i)
        data = np.zeros_like(d)
        for k, off in enumerate(self.offsets):
            if off >= 0:
                data[k, off:] = d[k, : n - off] if off else d[k]
            else:
                data[k, :off] = d[k, -off:]
        return sp.dia_matrix((data, np.array(self.offsets)), shape=self.shape).tocsr()

    def tree_flatten(self):
        return (self.diags, self.dp), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.diags, obj.dp = children
        obj.offsets, obj.shape = aux
        obj.dtype = getattr(obj.diags, "dtype", None)
        return obj


@register_pytree_node_class
class AIJOperator(LinearOperator):
    """General sparse matrix in padded-ELL layout.

    Built from CSR on host; each row's entries are padded to the max row
    width W.  SpMV is W gather+FMA sweeps over dense (m,)-vectors —
    row-aligned and static-shaped so XLA can tile it; a Pallas kernel can
    slot in for the gather when profiling demands.  This is the TPU
    re-design of PETSc MPIAIJ MatMult (reference hot path in
    src/sys/classes/bv/interface/bvops.c BVMatMultColumn).
    """

    def __init__(self, indices, data, shape, nnz=None, scipy_mat=None,
                 indices_t=None, data_t=None):
        self.indices = jnp.asarray(indices)  # (m, W) int32, padded with 0
        self.data = jnp.asarray(data)  # (m, W), padded with 0.0
        self.shape = tuple(shape)
        self.dtype = self.data.dtype
        self._nnz = int(nnz) if nnz is not None else int(self.data.size)
        self._scipy = scipy_mat  # host CSR retained for direct factorization
        self.indices_t = None if indices_t is None else jnp.asarray(indices_t)
        self.data_t = None if data_t is None else jnp.asarray(data_t)
        self._gell = None  # hybrid-ELL Pallas form, packed lazily

    def to_gell(self, block_rows: int = 256):
        """Hybrid diagonal/gather ELL Pallas form (ops/ell_pallas.py) for
        the jitted fast paths; packed once and cached.  Returns None when
        the sparsity pattern falls outside the kernel's limits (scattered
        far off-band entries) — callers keep the XLA gather path."""
        if self._gell is False:
            return None
        if self._gell is None:
            try:
                from ..ops.ell_pallas import GELLPaddedOperator

                if self.shape[0] != self.shape[1]:
                    raise ValueError("square operators only")
                # structure detection: a matrix whose nonzeros live on a
                # few DENSE diagonals is a DIA matrix in CSR clothing —
                # the 512-lane DIA roll kernel runs at ~stream speed
                # while the 128-lane hybrid view pays roll/select
                # overhead per slot (measured 0.27 vs ~0.99 of stream on
                # a 9-point banded operator).  The hybrid kernel is kept
                # for genuinely irregular patterns (gather slots).
                dia = self._try_dia_padded()
                if dia is not None:
                    self._gell = dia
                else:
                    self._gell = GELLPaddedOperator.from_scipy(
                        self.to_scipy(), block_rows,
                        dtype=np.dtype(self.dtype))
            except (ValueError, AssertionError):
                self._gell = False
                return None
        return self._gell

    def _try_dia_padded(self, max_diags: int = 32, min_fill: float = 0.5):
        """DIAPaddedOperator when the pattern is a small set of dense
        diagonals (each >= min_fill*n), else None."""
        import scipy.sparse as sp

        from ..ops.dia_pallas import DIAPaddedOperator, dia_spmv_supported

        A = sp.csr_matrix(self.to_scipy())
        n = A.shape[0]
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
        off = A.indices.astype(np.int64) - rows
        uoff, counts = np.unique(off, return_counts=True)
        if len(uoff) > max_diags or np.min(counts) < min_fill * n:
            return None
        offsets = tuple(int(o) for o in uoff)
        if not dia_spmv_supported(offsets, n, self.dtype):
            return None
        diags = np.zeros((len(uoff), n), A.dtype)
        for i, o in enumerate(uoff):
            sel = off == o
            diags[i, rows[sel]] = A.data[sel]
        return DIAPaddedOperator.from_dia(DIAOperator(offsets, diags))

    @classmethod
    def from_scipy(cls, A, dtype=None, with_transpose: bool = True,
                   keep_host: bool = True) -> "AIJOperator":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        if dtype is not None:
            A = A.astype(dtype)
        ind, dat = _csr_to_ell(A)
        ind_t = dat_t = None
        if with_transpose and A.shape[0] != A.shape[1] or with_transpose:
            AT = sp.csr_matrix(A.T.conj())
            ind_t, dat_t = _csr_to_ell(AT)
        return cls(ind, dat, A.shape, nnz=A.nnz, scipy_mat=A if keep_host else None,
                   indices_t=ind_t, data_t=dat_t)

    @property
    def nnz(self):
        return self._nnz

    @staticmethod
    def _ell_mult(indices, data, x2):
        """y = ELL(indices,data) @ x2 with x2 (n,k)."""
        W = indices.shape[1]
        y = jnp.zeros((indices.shape[0], x2.shape[1]), dtype=jnp.result_type(data, x2))

        def body(j, y):
            return y + data[:, j][:, None] * x2[indices[:, j], :]

        return jax.lax.fori_loop(0, W, body, y) if W > 8 else _unrolled(indices, data, x2, y)

    def mult(self, x):
        x2, was1 = _as2d(x)
        y = self._ell_mult(self.indices, self.data, x2)
        return y[:, 0] if was1 else y

    def mult_h(self, x):
        if self.indices_t is None:
            raise ValueError("AIJOperator built without transpose; pass with_transpose=True")
        x2, was1 = _as2d(x)
        y = self._ell_mult(self.indices_t, self.data_t, x2)
        return y[:, 0] if was1 else y

    def norm_estimate(self) -> float:
        import jax.numpy as _jnp

        return float(_jnp.linalg.norm(self.data))

    def to_scipy(self):
        if self._scipy is not None:
            return self._scipy
        import scipy.sparse as sp

        m, W = self.indices.shape
        ind = np.asarray(self.indices).ravel()
        dat = np.asarray(self.data).ravel()
        rows = np.repeat(np.arange(m), W)
        mask = dat != 0
        return sp.csr_matrix((dat[mask], (rows[mask], ind[mask])), shape=self.shape)

    def tree_flatten(self):
        leaves = (self.indices, self.data, self.indices_t, self.data_t)
        return leaves, (self.shape, self._nnz, self._scipy)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.indices, obj.data, obj.indices_t, obj.data_t = children
        obj.shape, obj._nnz, obj._scipy = aux
        obj.dtype = getattr(obj.data, "dtype", None)
        obj._gell = None
        return obj


def _unrolled(indices, data, x2, y):
    for j in range(indices.shape[1]):
        y = y + data[:, j][:, None] * x2[indices[:, j], :]
    return y


def _csr_to_ell(A) -> Tuple[np.ndarray, np.ndarray]:
    """CSR -> padded ELL (indices, data), pad index 0 / value 0."""
    m = A.shape[0]
    counts = np.diff(A.indptr)
    W = max(int(counts.max()) if m else 0, 1)
    ind = np.zeros((m, W), dtype=np.int32)
    dat = np.zeros((m, W), dtype=A.dtype)
    for i in range(m):
        s, e = A.indptr[i], A.indptr[i + 1]
        ind[i, : e - s] = A.indices[s:e]
        dat[i, : e - s] = A.data[s:e]
    return ind, dat


@register_pytree_node_class
class ShellOperator(LinearOperator):
    """Operator defined by callbacks (MATSHELL analog).

    ``matvec``/``rmatvec`` take (n,) or (n,k) arrays.  Captured jax arrays
    inside the closures become jit constants — appropriate for solver-built
    shells (ST operators, SVD cross/cyclic operators).
    """

    def __init__(self, shape, dtype, matvec: Callable, rmatvec: Optional[Callable] = None,
                 nnz: Optional[int] = None, host_callback: bool = False):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._matvec = matvec
        self._rmatvec = rmatvec
        self._nnz = nnz
        # True when the apply contains a host-side solve that cannot be
        # traced into jit on callback-less TPU plugins; Krylov loops then
        # run their host-orchestrated variant (bv.krylov.extend_dispatch)
        self.host_callback = host_callback

    @property
    def nnz(self):
        return self._nnz if self._nnz is not None else self.shape[0] * self.shape[1]

    def mult(self, x):
        return self._matvec(x)

    def mult_h(self, x):
        if self._rmatvec is None:
            raise ValueError("ShellOperator has no rmatvec")
        return self._rmatvec(x)

    def tree_flatten(self):
        return (), (self.shape, str(self.dtype), self._matvec, self._rmatvec,
                    self._nnz, self.host_callback)

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, dt, mv, rmv, nnz, hcb = aux
        return cls(shape, np.dtype(dt), mv, rmv, nnz, host_callback=hcb)


@register_pytree_node_class
class ScaledOperator(LinearOperator):
    def __init__(self, op: LinearOperator, alpha):
        self.op = op
        self.alpha = alpha
        self.shape = op.shape
        self.dtype = op.dtype

    @property
    def nnz(self):
        return self.op.nnz

    def mult(self, x):
        return self.alpha * self.op.mult(x)

    def mult_h(self, x):
        return np.conj(self.alpha) * self.op.mult_h(x)

    def tree_flatten(self):
        return (self.op,), (self.alpha,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@register_pytree_node_class
class SumOperator(LinearOperator):
    """sum_i coeff_i * op_i (same shape)."""

    def __init__(self, ops: Sequence[LinearOperator], coeffs: Sequence):
        self.ops = tuple(ops)
        self.coeffs = tuple(coeffs)
        self.shape = self.ops[0].shape
        self.dtype = np.result_type(*[o.dtype for o in self.ops])

    @property
    def nnz(self):
        return sum(o.nnz for o in self.ops)

    def mult(self, x):
        y = None
        for c, o in zip(self.coeffs, self.ops):
            t = o.mult(x) if c == 1.0 else c * o.mult(x)
            y = t if y is None else y + t
        return y

    def mult_h(self, x):
        y = None
        for c, o in zip(self.coeffs, self.ops):
            cc = np.conj(c)
            t = o.mult_h(x) if cc == 1.0 else cc * o.mult_h(x)
            y = t if y is None else y + t
        return y

    def tree_flatten(self):
        return (self.ops,), (self.coeffs,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@register_pytree_node_class
class ProductOperator(LinearOperator):
    """op_0 @ op_1 @ ... (applied right to left)."""

    def __init__(self, ops: Sequence[LinearOperator]):
        self.ops = tuple(ops)
        self.shape = (self.ops[0].shape[0], self.ops[-1].shape[1])
        self.dtype = np.result_type(*[o.dtype for o in self.ops])

    @property
    def nnz(self):
        return sum(o.nnz for o in self.ops)

    def mult(self, x):
        for o in reversed(self.ops):
            x = o.mult(x)
        return x

    def mult_h(self, x):
        for o in self.ops:
            x = o.mult_h(x)
        return x

    def tree_flatten(self):
        return (self.ops,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@register_pytree_node_class
class AdjointOperator(LinearOperator):
    def __init__(self, op: LinearOperator):
        self.op = op
        self.shape = (op.shape[1], op.shape[0])
        self.dtype = op.dtype

    @property
    def nnz(self):
        return self.op.nnz

    def mult(self, x):
        return self.op.mult_h(x)

    def mult_h(self, x):
        return self.op.mult(x)

    @property
    def H(self):
        return self.op

    def tree_flatten(self):
        return (self.op,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@register_pytree_node_class
class DiagonalOperator(LinearOperator):
    """diag(d); used for balancing, preconditioning, Omega signatures."""

    def __init__(self, d):
        self.d = jnp.asarray(d)
        n = self.d.shape[0]
        self.shape = (n, n)
        self.dtype = self.d.dtype

    @property
    def nnz(self):
        return self.shape[0]

    def mult(self, x):
        x2, was1 = _as2d(x)
        y = self.d[:, None] * x2
        return y[:, 0] if was1 else y

    def mult_h(self, x):
        x2, was1 = _as2d(x)
        y = self.d.conj()[:, None] * x2
        return y[:, 0] if was1 else y

    def tree_flatten(self):
        return (self.d,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def norm_estimate_randomized(A: "LinearOperator", seed: int = 0) -> float:
    """Randomized matrix-norm estimate: sqrt(n)*||A v|| for a normalized
    Gaussian v (reference: MatNormEstimate, src/sys/mat/matutil.c:391 —
    overestimates ||A||_2 with high probability; one matvec)."""
    import jax.numpy as jnp

    n = A.shape[1]
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        v = v + 1j * rng.standard_normal(n)
    v = v / np.linalg.norm(v)
    w = A.mult(jnp.asarray(v, dtype=A.dtype))
    return float(jnp.linalg.norm(w)) * float(np.sqrt(n))


def aslinearoperator(A) -> LinearOperator:
    """Coerce scipy-sparse / ndarray / LinearOperator into our type."""
    if isinstance(A, LinearOperator):
        return A
    try:
        import scipy.sparse as sp

        if sp.issparse(A):
            return AIJOperator.from_scipy(A)
    except ImportError:
        pass
    return DenseOperator(jnp.asarray(A))
