"""Halo-exchange DIA SpMV over a 1-D row mesh.

y[i] = sum_d diags[d][i] * x[i + offsets[d]]  — the DIAOperator contract
(mat/linop.py).  With x row-sharded, a shifted read x[i+off] crosses shard
boundaries by at most h = max|off| elements.  GSPMD lowers the naive
jnp.roll formulation to an all-gather of the WHOLE vector (O(n) bytes on
the interconnect); this module instead ships only the 2h boundary
elements per device with jax.lax.ppermute — the analog of the reference's
VecScatter ghost-point update inside MPIAIJ MatMult
(PETSc src/mat/impls/aij/mpi/mpiaij.c MatMult_MPIAIJ: local part +
scatter of ghost values), re-designed for ICI: one collective-permute
pair per SpMV, payload h elements, independent of device count.

Requirements: n divisible by the mesh size, and h <= n/k (halo within
the nearest neighbor — true for stencil operators at practical sizes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sys.mesh import ROWS, get_mesh


def _halo_width(offsets: Sequence[int]) -> int:
    return max((abs(int(o)) for o in offsets), default=0)


@partial(jax.jit, static_argnames=("offsets", "mesh"))
def dia_spmv_halo(diags, x, *, offsets: tuple, mesh: Mesh):
    """Sharded DIA SpMV with explicit halo exchange.

    Args:
      diags: (ndiag, n) sharded P(None, "rows") — out-of-range entries
             pre-zeroed (DIAOperator convention).
      x:     (n,) sharded P("rows").
      offsets: static tuple of diagonal offsets.
      mesh:  1-D mesh with axis "rows".
    Returns y (n,) sharded P("rows").
    """
    k = mesh.shape[ROWS]
    n = x.shape[0]
    h = _halo_width(offsets)
    assert n % k == 0 and h <= n // k, (n, k, h)

    def local(d_loc, x_loc):
        # d_loc (ndiag, nloc), x_loc (nloc,)
        nloc = x_loc.shape[0]
        if h == 0:
            xext = x_loc
        else:
            # halo from the right neighbor (for positive offsets): its
            # first h entries; from the left (negative offsets): its last
            # h.  Edge shards receive zeros — matches the pre-zeroed
            # diagonal entries at the global boundary.
            right = jax.lax.ppermute(
                x_loc[:h], ROWS, [(i + 1, i) for i in range(k - 1)])
            left = jax.lax.ppermute(
                x_loc[nloc - h:], ROWS, [(i, i + 1) for i in range(k - 1)])
            xext = jnp.concatenate([left, x_loc, right])
        y = jnp.zeros_like(x_loc)
        for d, off in enumerate(offsets):
            seg = jax.lax.dynamic_slice(xext, (h + off,), (nloc,)) \
                if h else x_loc
            y = y + d_loc[d] * seg
        return y

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(None, ROWS), P(ROWS)),
                         out_specs=P(ROWS))(diags, x)


@partial(jax.jit, static_argnames=("offsets", "mesh"))
def dia_spmm_halo(diags, X, *, offsets: tuple, mesh: Mesh):
    """Block variant of dia_spmv_halo: X (n, k) sharded P(ROWS, None);
    one collective-permute pair ships the boundary rows of ALL columns."""
    kdev = mesh.shape[ROWS]
    n = X.shape[0]
    h = _halo_width(offsets)
    assert n % kdev == 0 and h <= n // kdev, (n, kdev, h)

    def local(d_loc, X_loc):
        nloc = X_loc.shape[0]
        if h == 0:
            Xext = X_loc
        else:
            right = jax.lax.ppermute(
                X_loc[:h], ROWS, [(i + 1, i) for i in range(kdev - 1)])
            left = jax.lax.ppermute(
                X_loc[nloc - h:], ROWS, [(i, i + 1) for i in range(kdev - 1)])
            Xext = jnp.concatenate([left, X_loc, right], axis=0)
        Y = jnp.zeros_like(X_loc)
        for d, off in enumerate(offsets):
            seg = jax.lax.dynamic_slice_in_dim(Xext, h + off, nloc, axis=0) \
                if h else X_loc
            Y = Y + d_loc[d][:, None] * seg
        return Y

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(None, ROWS), P(ROWS, None)),
                         out_specs=P(ROWS, None))(diags, X)


class HaloDIAOperator:
    """DIA operator bound to a row mesh; mult() uses the halo exchange.

    Registered as a pytree so it can close over jitted solver cycles
    (same contract as DIAOperator).  Build with ``from_dia``.
    """

    def __init__(self, offsets, diags, mesh: Optional[Mesh] = None):
        self.offsets = tuple(int(o) for o in offsets)
        self.mesh = mesh if mesh is not None else get_mesh()
        if self.mesh is None:
            raise ValueError("HaloDIAOperator requires a row mesh "
                             "(slepc_tpu.set_mesh)")
        k = self.mesh.shape[ROWS]
        n_chk = np.shape(diags)[1]
        if n_chk % k != 0:
            raise ValueError(
                f"HaloDIAOperator: n={n_chk} not divisible by the mesh "
                f"size {k}; pad the operator (sys.mesh.nrows_padded) or "
                f"use a divisible grid")
        h_chk = _halo_width(offsets)
        if h_chk > n_chk // k:
            raise ValueError(
                f"HaloDIAOperator: halo {h_chk} exceeds the shard size "
                f"{n_chk // k}; offsets must stay within nearest neighbors")
        self.diags = jax.device_put(
            jnp.asarray(diags), NamedSharding(self.mesh, P(None, ROWS)))
        n = self.diags.shape[1]
        self.shape = (n, n)
        self.dtype = self.diags.dtype

    @classmethod
    def from_dia(cls, op, mesh: Optional[Mesh] = None):
        return cls(op.offsets, op.diags, mesh)

    def mult(self, x):
        if x.ndim == 1:
            return dia_spmv_halo(self.diags, x, offsets=self.offsets,
                                 mesh=self.mesh)
        # block: ONE shard_map with a single ppermute pair carrying the
        # (h, k) boundary block of all k columns together (the reference
        # batches the VecScatter the same way for BVMatMult)
        return dia_spmm_halo(self.diags, x, offsets=self.offsets,
                             mesh=self.mesh)

    # LinearOperator protocol pieces used by the solvers
    def rmult(self, x):
        return self.mult(x)  # symmetric stencils only; adjoint via AIJ path

    def to_dense(self):
        n = self.shape[0]
        A = jnp.zeros((n, n), self.dtype)
        d = np.asarray(jax.device_get(self.diags))
        for i, off in enumerate(self.offsets):
            rows = np.arange(max(0, -off), min(n, n - off))
            A = A.at[rows, rows + off].set(jnp.asarray(d[i, rows]))
        return A


def _tree_flatten(op):
    return (op.diags,), (op.offsets, op.mesh, op.shape, op.dtype)


def _tree_unflatten(aux, children):
    op = object.__new__(HaloDIAOperator)
    op.diags, = children
    op.offsets, op.mesh, op.shape, op.dtype = aux
    return op


jax.tree_util.register_pytree_node(HaloDIAOperator, _tree_flatten,
                                   _tree_unflatten)
