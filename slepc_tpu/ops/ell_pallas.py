"""Pallas TPU kernel for general-sparsity (AIJ/CSR) SpMV — gather-ELL.

The TPU re-design of the reference's MPIAIJ MatMult backbone (PETSc CSR
SpMV feeding BVMatMult, reference hot path
src/sys/classes/bv/interface/bvops.c:692-717).  CSR's per-row indirect
gathers do not map to the TPU's vector unit; Mosaic's one native gather is
``tpu.dynamic_gather`` on a (R, 128) tile along lanes:
out[r, j] = x[r, idx[r, j]] with idx in [0, 128).

That primitive fixes the layout:

  * the vector is viewed 2-D as (rows, 128): element g sits at view row
    g >> 7, lane g & 127;
  * every nonzero A[k, g] is binned by its BLOCK-ROW OFFSET
    d = (g >> 7) - (k >> 7).  Within one bin, fetching the operands of all
    rows is ONE static sublane shift of the x view by d rows followed by
    ONE lane gather with idx = g & 127 — the DIA kernel generalized from
    "diagonal offset" to "block-row offset + arbitrary lane";
  * a bin needs as many SLOTS as its densest row has entries; slots are
    padded (data 0, idx 0).  Per slot and row block the kernel does one
    gather + one FMA on the VPU.
  * lane indices are stored int8 (top bit unused: values < 128) and
    upcast in-VMEM — 5 bytes of stream per stored entry vs CSR's 8.

Speed of light: (4 + 1) bytes per slot entry + the x/y streams; for a
banded matrix with ~70% slot fill this is ~2x the DIA format's bytes —
the price of arbitrary sparsity, still far ahead of XLA's gather loop.

Layout, padding, halo blocks, and the chained zero-copy convention are
shared with ops/dia_pallas.py (W here = 128 lanes); the sharded wrapper
in parallel/halo_pallas.py composes with it through the same seam.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_pytree_node_class

from .dia_pallas import _interp

WL = 128  # lane width of the gather view (the tpu.dynamic_gather vreg width)


def pack_gell(A, block_rows: int = 256):
    """Host-side packing: CSR -> gather-ELL slot arrays.

    Returns (dslots, idx, data, n):
      dslots: tuple of per-slot block-row offsets d (static);
      idx:    (S, nblk*Rb, WL) int8 lane indices;
      data:   (S, nblk*Rb, WL) values;
    Rows are padded to nblk*Rb*WL; empty slot entries carry data 0.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    assert A.shape[0] == A.shape[1], "gather-ELL packs square operators"
    Rb = block_rows
    nblk = -(-n // (Rb * WL))
    R = nblk * Rb

    # bin nonzeros by d; slot number = running index within a (row, d) group
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    cols = A.indices.astype(np.int64)
    vals = A.data
    if len(rows) == 0:
        return (0,), jnp.zeros((1, R, WL), np.int8), \
            jnp.zeros((1, R, WL), A.dtype), n
    d_all = (cols >> 7) - (rows >> 7)

    order = np.lexsort((cols, rows, d_all))  # group by d, then row
    rs, cs, ds, vs = rows[order], cols[order], d_all[order], vals[order]
    key = ds * (2 * n) + rs  # unique per (d, row); d in (-n/128, n/128)
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(first)
    grp = np.cumsum(first) - 1
    slot_no = np.arange(len(key)) - starts[grp]  # slot within (d, row)

    if slot_no.max() >= 64:
        raise ValueError(
            f"gather-ELL: {int(slot_no.max()) + 1} entries of one row share "
            f"a 128-column block (>64 slots); use the XLA path")
    # plane id = dense index of the (d, slot_no) pair
    pkey = ds * 64 + slot_no
    uniq, pid = np.unique(pkey, return_inverse=True)
    S = len(uniq)
    dslots = tuple(int(np.floor_divide(u, 64)) for u in uniq)

    idx = np.zeros((S, R, WL), np.int8)
    data = np.zeros((S, R, WL), A.dtype)
    flat = pid * (R * WL) + (rs >> 7) * WL + (rs & 127)
    idx.reshape(-1)[flat] = (cs & 127).astype(np.int8)
    data.reshape(-1)[flat] = vs
    return dslots, jnp.asarray(idx), jnp.asarray(data), n


def gell_supported(dslots: Sequence[int], block_rows: int = 256) -> bool:
    """Kernel applicability: every block-row offset within one neighbor
    block (3-block neighborhood), and a sane slot count."""
    if not dslots:
        return False
    dmax = max(abs(int(d)) for d in dslots)
    return dmax < block_rows and len(dslots) <= 64


def _lane_gather(src, idx):
    """out[r, j] = src[r, idx[r, j]] — the one native Mosaic gather
    (tpu.dynamic_gather along lanes).  Built directly on lax.gather with
    int32 indices: jnp.take_along_axis under x64 mode inserts an int64
    conversion that Mosaic cannot lower."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        src, idx.astype(jnp.int32)[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _gell_kernel(dslots: Tuple[int, ...], Rb: int, nblk: int,
                 xm_ref, xc_ref, xp_ref, idx_ref, dat_ref, y_ref):
    """Padded-layout gather-ELL SpMV; halo output blocks zeroed so outputs
    chain as inputs (the dia_pallas _dia_kernel2 convention)."""
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        y_ref[:] = jnp.zeros((Rb, WL), y_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i <= nblk))
    def _():
        x3 = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=0)
        acc = None
        for s, d in enumerate(dslots):
            src = x3[Rb + d: 2 * Rb + d, :]
            g = _lane_gather(src, idx_ref[s])
            term = dat_ref[s] * g
            acc = term if acc is None else acc + term
        y_ref[:] = acc


@partial(jax.jit, static_argnames=("dslots", "n", "block_rows"))
def gell_spmv_padded(dslots: Tuple[int, ...], idx, data, xp, n: int,
                     block_rows: int = 256):
    """SpMV in the padded chained layout ((nblk+2)*Rb, WL) -> same."""
    S = data.shape[0]
    Rb = block_rows
    nblk = -(-n // (Rb * WL))
    y = pl.pallas_call(
        partial(_gell_kernel, tuple(dslots), Rb, nblk),
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec((Rb, WL), lambda i: (jnp.maximum(i - 1, i * 0), i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, WL), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, WL),
                         lambda i: (jnp.minimum(i + 1, i * 0 + (nblk + 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Rb, WL),
                         lambda i: (i * 0,
                                    jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                i * 0 + (nblk - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Rb, WL),
                         lambda i: (i * 0,
                                    jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                i * 0 + (nblk - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, WL), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((nblk + 2) * Rb, WL), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * nblk * Rb * WL,
            bytes_accessed=(data.size * (data.dtype.itemsize + 1)
                            + 3 * n * xp.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xp, xp, xp, idx, data)
    return y


def gell_pad_vec(x, n: int, block_rows: int = 256):
    """x (n,) -> padded layout ((nblk+2)*Rb, WL)."""
    Rb = block_rows
    B = Rb * WL
    nblk = -(-n // B)
    xp = jnp.zeros(((nblk + 2) * Rb, WL), x.dtype)
    body = jnp.zeros(nblk * B, x.dtype).at[:n].set(x).reshape(nblk * Rb, WL)
    return jax.lax.dynamic_update_slice(xp, body, (Rb, 0))


def gell_unpad_vec(xp, n: int, block_rows: int = 256):
    Rb = block_rows
    return xp[Rb:, :].reshape(-1)[:n]


@register_pytree_node_class
class GELLPaddedOperator:
    """Gather-ELL operator on padded-layout vectors (DIAPaddedOperator
    contract: mult2d / pad2d / unpad / mask2d), so the jitted Krylov
    cycles run general CSR matrices at kernel speed."""

    def __init__(self, dslots, idx, data, n, nnz, block_rows=256, mask=None):
        self.dslots = tuple(int(d) for d in dslots)
        self.idx = idx
        self.data = data
        self.n_interior = int(n)
        self._nnz = int(nnz)
        self.block_rows = block_rows
        Rb = block_rows
        nblk = -(-self.n_interior // (Rb * WL))
        self.n_pad = (nblk + 2) * Rb * WL
        self.shape = (self.n_pad, self.n_pad)
        self.dtype = data.dtype
        self.mask = mask if mask is not None else self._make_mask()

    @classmethod
    def from_scipy(cls, A, block_rows: int = 256, dtype=None):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        if dtype is not None:
            A = A.astype(dtype)
        dslots, idx, data, n = pack_gell(A, block_rows)
        if not gell_supported(dslots, block_rows):
            raise ValueError(
                f"gather-ELL: block-offset range {min(dslots)}..{max(dslots)}"
                f" / {len(dslots)} slots outside kernel limits "
                f"(reorder with RCM or use the XLA path)")
        return cls(dslots, idx, data, n, A.nnz, block_rows)

    @classmethod
    def from_aij(cls, A, block_rows: int = 256):
        return cls.from_scipy(A.to_scipy(), block_rows)

    def _make_mask(self):
        Rb = self.block_rows
        nblk = -(-self.n_interior // (Rb * WL))
        m = jnp.zeros(self.n_pad, dtype=self.dtype)
        interior = jnp.zeros(nblk * Rb * WL, self.dtype) \
            .at[: self.n_interior].set(1.0)
        m = jax.lax.dynamic_update_slice(m, interior, (Rb * WL,))
        return m.reshape(-1, WL)

    @property
    def nnz(self):
        return self._nnz

    @property
    def slot_fill(self) -> float:
        """Fraction of slot entries that are real nonzeros (packing
        efficiency diagnostic)."""
        return self._nnz / float(self.data.size)

    @property
    def mask2d(self):
        return self.mask

    def mult2d(self, xp):
        return gell_spmv_padded(self.dslots, self.idx, self.data, xp,
                                self.n_interior, self.block_rows)

    def mult(self, x):
        return self.mult2d(x.reshape(-1, WL)).reshape(-1)

    mult_h = mult  # fast path used for symmetric problems only

    def pad2d(self, x):
        return gell_pad_vec(jnp.asarray(x, self.dtype), self.n_interior,
                            self.block_rows)

    def pad(self, x):
        return self.pad2d(x).reshape(-1)

    def unpad(self, xp):
        return gell_unpad_vec(xp.reshape(-1, WL), self.n_interior,
                              self.block_rows)

    def tree_flatten(self):
        return (self.idx, self.data, self.mask), \
            (self.dslots, self.n_interior, self._nnz, self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.idx, obj.data, obj.mask = children
        obj.dslots, obj.n_interior, obj._nnz, obj.block_rows = aux
        Rb = obj.block_rows
        nblk = -(-obj.n_interior // (Rb * WL))
        obj.n_pad = (nblk + 2) * Rb * WL
        obj.shape = (obj.n_pad, obj.n_pad)
        obj.dtype = getattr(obj.data, "dtype", None)
        return obj
