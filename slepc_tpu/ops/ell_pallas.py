"""Pallas TPU kernel for general-sparsity (AIJ/CSR) SpMV — hybrid
diagonal/gather ELL.

The TPU re-design of the reference's MPIAIJ MatMult backbone (PETSc CSR
SpMV feeding BVMatMult, reference hot path
src/sys/classes/bv/interface/bvops.c:692-717).  CSR's per-row indirect
gathers do not map to the TPU's vector unit, so the matrix is split by
structure at pack time:

  * DIAGONAL slots — offsets o = q*128 + r whose diagonal is dense
    (count >= dia_frac*n).  Fetch = one static sublane shift by q plus a
    lane ROTATION by r with a carry select (exactly the dia_pallas
    scheme on a 128-lane view): 4 bytes of stream per stored value, pure
    VPU FMA, no index plane, regardless of 128-alignment.
  * GATHER slots — everything irregular, binned by BLOCK-ROW OFFSET
    d = (g >> 7) - (k >> 7).  Within one bin, fetching all rows' operands
    is ONE static sublane shift of the x view by d plus ONE native lane
    gather (tpu.dynamic_gather on a (R, 128) tile:
    out[r, j] = x[r, idx[r, j]]).  A bin needs as many slots as its
    densest row has entries there; idx is stored int8 (values < 128),
    5 bytes of stream per slot entry.

A measured A/B on-device: the gather op is ~4x slower than a roll at
equal traffic, so promoting dense diagonals to roll slots is the main
lever; matrices that are mostly-stencil-plus-corrections run at near-DIA
speed with a couple of gather slots mopping up the rest.

The vector is viewed 2-D as (rows, 128): element g sits at view row
g >> 7, lane g & 127.  Layout, padding, halo blocks, and the chained
zero-copy convention are shared with ops/dia_pallas.py (W here = 128
lanes); the multi-device wrapper composes through the same seam
(boundary-row ppermute into the halo blocks).
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


def pack_hyb(A, block_rows: int = 256, dia_frac: float = 0.4,
             nblk: int = None):
    """Host-side packing: CSR -> (diagonal slots, gather slots).

    Returns (qr_slots, dd, dslots, idx, data, n):
      qr_slots: tuple of (q, r) per DIAGONAL slot (offset o = q*WL + r);
      dd:       (Sd, nblk*Rb, WL) diagonal values at OUTPUT positions;
      dslots:   tuple of block-row offsets d per GATHER slot;
      idx:      (Sg, nblk*Rb, WL) int8 lane indices;
      data:     (Sg, nblk*Rb, WL) gather-slot values.
    Empty tiers return () and a (0, R, WL) array.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    assert A.shape[0] == A.shape[1], "hybrid ELL packs square operators"
    Rb = block_rows
    if nblk is None:
        nblk = -(-n // (Rb * WL))
    R = nblk * Rb

    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    cols = A.indices.astype(np.int64)
    vals = A.data
    if len(rows) == 0:
        return ((), np.zeros((0, R, WL), A.dtype), (),
                np.zeros((0, R, WL), np.int8), np.zeros((0, R, WL), A.dtype),
                n)

    # ---- tier 1: dense diagonals -> roll slots ----
    off = cols - rows
    uoff, counts = np.unique(off, return_counts=True)
    dense = set(int(o) for o, c in zip(uoff, counts)
                if c >= dia_frac * n and abs(o) < (Rb - 2) * WL)
    qr_slots, dd_planes = [], []
    is_dia = np.isin(off, sorted(dense))
    for o in sorted(dense):
        sel = off == o
        plane = np.zeros((R * WL,), A.dtype)
        plane[rows[sel]] = vals[sel]
        qr_slots.append((int(o) // WL, int(o) % WL))
        dd_planes.append(plane.reshape(R, WL))
    dd = np.stack(dd_planes) if dd_planes else np.zeros((0, R, WL), A.dtype)

    # ---- tier 2: the rest -> gather slots binned by block-row offset ----
    rs, cs, vs = rows[~is_dia], cols[~is_dia], vals[~is_dia]
    if len(rs) == 0:
        return (tuple(qr_slots), dd, (), np.zeros((0, R, WL), np.int8),
                np.zeros((0, R, WL), A.dtype), n)
    d_all = (cs >> 7) - (rs >> 7)
    order = np.lexsort((cs, rs, d_all))
    rs, cs, ds, vs = rs[order], cs[order], d_all[order], vs[order]
    key = ds * (2 * n) + rs
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(first)
    grp = np.cumsum(first) - 1
    slot_no = np.arange(len(key)) - starts[grp]
    if slot_no.max() >= 64:
        raise ValueError(
            f"hybrid ELL: {int(slot_no.max()) + 1} irregular entries of one "
            f"row share a 128-column block (>64 slots); use the XLA path")
    pkey = ds * 64 + slot_no
    uniq, pid = np.unique(pkey, return_inverse=True)
    Sg = len(uniq)
    dslots = tuple(int(np.floor_divide(u, 64)) for u in uniq)

    idx = np.zeros((Sg, R, WL), np.int8)
    data = np.zeros((Sg, R, WL), A.dtype)
    flat = pid * (R * WL) + (rs >> 7) * WL + (rs & 127)
    idx.reshape(-1)[flat] = (cs & 127).astype(np.int8)
    data.reshape(-1)[flat] = vs
    return tuple(qr_slots), dd, dslots, idx, data, n


def hyb_supported(qr_slots, dslots, block_rows: int = 256) -> bool:
    """Kernel applicability: every reach within one neighbor block."""
    qmax = max((abs(q) + 1 for q, _ in qr_slots), default=0)
    dmax = max((abs(int(d)) for d in dslots), default=0)
    return (qmax < block_rows and dmax < block_rows
            and len(dslots) + len(qr_slots) <= 80)


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


def _hyb_kernel(qr_slots: Tuple[Tuple[int, int], ...],
                dslots: Tuple[int, ...], Rb: int, nblk: int,
                *refs):
    """Padded-layout hybrid SpMV; halo output blocks zeroed so outputs
    chain as inputs (the dia_pallas _dia_kernel2 convention)."""
    xm_ref, xc_ref, xp_ref = refs[:3]
    pos = 3
    dd_ref = None
    if qr_slots:
        dd_ref = refs[pos]
        pos += 1
    idx_ref = dat_ref = None
    if dslots:
        idx_ref, dat_ref = refs[pos], refs[pos + 1]
        pos += 2
    y_ref = refs[pos]
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        y_ref[:] = jnp.zeros((Rb, WL), y_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i <= nblk))
    def _():
        x3 = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Rb, WL), 1)
        acc = None
        for s, (q, r) in enumerate(qr_slots):
            Aq = x3[Rb + q: 2 * Rb + q, :]
            if r == 0:
                shifted = Aq
            else:
                Bq = x3[Rb + q + 1: 2 * Rb + q + 1, :]
                shift = np.int32(WL - r)
                shifted = jnp.where(col < WL - r,
                                    pltpu.roll(Aq, shift, axis=1),
                                    pltpu.roll(Bq, shift, axis=1))
            term = dd_ref[s] * shifted
            acc = term if acc is None else acc + term
        for s, d in enumerate(dslots):
            src = x3[Rb + d: 2 * Rb + d, :]
            g = _lane_gather(src, idx_ref[s])
            term = dat_ref[s] * g
            acc = term if acc is None else acc + term
        y_ref[:] = acc


@partial(jax.jit, static_argnames=("qr_slots", "dslots", "n", "block_rows"))
def hyb_spmv_padded(qr_slots, dslots, dd, idx, data, xp, n: int,
                    block_rows: int = 256):
    """SpMV in the padded chained layout ((nblk+2)*Rb, WL) -> same."""
    Rb = block_rows
    nblk = -(-n // (Rb * WL))

    xspecs = [
        pl.BlockSpec((Rb, WL), lambda i: (jnp.maximum(i - 1, i * 0), i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Rb, WL), lambda i: (i, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Rb, WL),
                     lambda i: (jnp.minimum(i + 1, i * 0 + (nblk + 1)), i * 0),
                     memory_space=pltpu.VMEM),
    ]

    def slot_spec(S):
        return pl.BlockSpec((S, Rb, WL),
                            lambda i: (i * 0,
                                       jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                   i * 0 + (nblk - 1)),
                                       i * 0),
                            memory_space=pltpu.VMEM)

    in_specs = list(xspecs)
    args = [xp, xp, xp]
    if qr_slots:
        in_specs.append(slot_spec(dd.shape[0]))
        args.append(dd)
    if dslots:
        in_specs += [slot_spec(idx.shape[0]), slot_spec(data.shape[0])]
        args += [idx, data]

    nbytes = (dd.size * dd.dtype.itemsize
              + data.size * (data.dtype.itemsize + 1)
              + 3 * n * xp.dtype.itemsize)
    y = pl.pallas_call(
        partial(_hyb_kernel, tuple(qr_slots), tuple(dslots), Rb, nblk),
        grid=(nblk + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Rb, WL), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((nblk + 2) * Rb, WL), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (dd.size + data.size),
            bytes_accessed=nbytes,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(*args)
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
    """Hybrid diagonal/gather ELL operator on padded-layout vectors
    (DIAPaddedOperator contract: mult2d / pad2d / unpad / mask2d), so the
    jitted Krylov cycles run general CSR matrices at kernel speed."""

    def __init__(self, qr_slots, dd, dslots, idx, data, n, nnz,
                 block_rows=256, mask=None):
        self.qr_slots = tuple((int(q), int(r)) for q, r in qr_slots)
        self.dslots = tuple(int(d) for d in dslots)
        self.dd = dd
        self.idx = idx
        self.data = data
        self.n_interior = int(n)
        self._nnz = int(nnz)
        self.block_rows = block_rows
        Rb = block_rows
        nblk = -(-self.n_interior // (Rb * WL))
        self.n_pad = (nblk + 2) * Rb * WL
        self.shape = (self.n_pad, self.n_pad)
        self.dtype = data.dtype if data.size else dd.dtype
        self.mask = mask if mask is not None else self._make_mask()

    @classmethod
    def from_scipy(cls, A, block_rows: int = 256, dtype=None,
                   dia_frac: float = 0.4):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        if dtype is not None:
            A = A.astype(dtype)
        qr_slots, dd, dslots, idx, data, n = pack_hyb(A, block_rows, dia_frac)
        if not hyb_supported(qr_slots, dslots, block_rows):
            raise ValueError(
                f"hybrid ELL: offsets outside kernel limits "
                f"({len(qr_slots)} dia + {len(dslots)} gather slots; "
                f"reorder with RCM or use the XLA path)")
        return cls(qr_slots, jnp.asarray(dd), dslots, jnp.asarray(idx),
                   jnp.asarray(data), n, A.nnz, block_rows)

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
        return self._nnz / float(max(self.data.size + self.dd.size, 1))

    @property
    def stream_bytes(self) -> int:
        """Matrix bytes one SpMV streams (roofline accounting)."""
        return int(self.dd.size * self.dd.dtype.itemsize
                   + self.data.size * (self.data.dtype.itemsize + 1))

    @property
    def mask2d(self):
        return self.mask

    def mult2d(self, xp):
        return hyb_spmv_padded(self.qr_slots, self.dslots, self.dd,
                               self.idx, self.data, xp,
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
        return (self.dd, self.idx, self.data, self.mask), \
            (self.qr_slots, self.dslots, self.n_interior, self._nnz,
             self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.dd, obj.idx, obj.data, obj.mask = children
        (obj.qr_slots, obj.dslots, obj.n_interior, obj._nnz,
         obj.block_rows) = aux
        Rb = obj.block_rows
        nblk = -(-obj.n_interior // (Rb * WL))
        obj.n_pad = (nblk + 2) * Rb * WL
        obj.shape = (obj.n_pad, obj.n_pad)
        obj.dtype = obj.data.dtype if obj.data.size else obj.dd.dtype
        return obj
