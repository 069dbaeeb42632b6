"""Multi-device DIA SpMV: the Pallas padded kernel under shard_map.

Composes the single-chip fast path (ops/dia_pallas.py) with the 1-D row
mesh: each shard holds its slice of the vector in the kernel's padded
2-D layout ((nblk_loc+2)*Rb, W) — interior blocks plus one halo block of
rows above and below — and an SpMV is

    ppermute the boundary rows into the neighbor's halo block
    + the unmodified single-chip Pallas kernel on the local padded slab.

This is the TPU re-design of the reference's VecScatter ghost update
inside MPIAIJ MatMult (PETSc MatMult_MPIAIJ; SLEPc hot path
src/sys/classes/bv/interface/bvops.c:862 BVMatMultColumn): the payload is
only the gt/gb boundary rows per neighbor (tile-aligned, independent of
device count), and the kernel itself is exactly the one benchmarked on a
single chip — multi-chip runs keep the single-chip kernel win.

Layout invariants (matching DIAPaddedOperator):
  * every shard's slab is ((nblk_loc+2)*Rb, W); rows [Rb, (nblk_loc+1)*Rb)
    are interior, the rest halo;
  * global element g lives on shard p = g // (nblk_loc*Rb*W) at interior
    position g % (nblk_loc*Rb*W);
  * halo blocks hold ZEROS at rest; `mult2d` fills the needed boundary
    rows from the neighbors and the kernel re-zeroes them in its output,
    so outputs chain as inputs (zero-copy Krylov loops).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dia_pallas import (W, _halo_rows, dia_spmv_padded,
                              dia_spmv_padded_v3, narrow_halo_ok,
                              prepare_diags)
from ..sys.mesh import ROWS


@partial(jax.jit, static_argnames=("offsets", "nloc", "block_rows", "mesh"))
def dia_spmv_padded_sharded(offsets, dp, xp, *, nloc: int,
                            block_rows: int, mesh: Mesh):
    """Sharded chained-layout SpMV.

    Args:
      dp: (nd, k*nblk_loc*Rb, W) diagonal blocks, sharded P(None, ROWS, None).
      xp: (k*(nblk_loc+2)*Rb, W) stacked local padded slabs, P(ROWS, None).
      nloc: interior elements per shard (= nblk_loc*Rb*W).
    Returns yp with xp's layout and sharding.
    """
    k = mesh.shape[ROWS]
    Rb = block_rows
    nblk = -(-nloc // (Rb * W))
    gt, gb = _halo_rows(tuple(offsets))
    kern = dia_spmv_padded_v3 if narrow_halo_ok(offsets, Rb) \
        else dia_spmv_padded

    def local(dp_loc, xp_loc):
        if k > 1:
            # boundary rows -> neighbor halo blocks (VecScatter analog)
            top_src = jax.lax.slice_in_dim(
                xp_loc, (nblk + 1) * Rb - gt, (nblk + 1) * Rb, axis=0)
            bot_src = jax.lax.slice_in_dim(xp_loc, Rb, Rb + gb, axis=0)
            from_left = jax.lax.ppermute(
                top_src, ROWS, [(i, i + 1) for i in range(k - 1)])
            from_right = jax.lax.ppermute(
                bot_src, ROWS, [(i + 1, i) for i in range(k - 1)])
            xp_loc = jax.lax.dynamic_update_slice_in_dim(
                xp_loc, from_left, Rb - gt, axis=0)
            xp_loc = jax.lax.dynamic_update_slice_in_dim(
                xp_loc, from_right, (nblk + 1) * Rb, axis=0)
        return kern(tuple(offsets), dp_loc, xp_loc, nloc, Rb)

    # check_vma=False: pallas_call inside shard_map cannot express its
    # output's varying-across-mesh annotation (jax 0.9)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(None, ROWS, None), P(ROWS, None)),
                         out_specs=P(ROWS, None), check_vma=False)(dp, xp)


class ShardedDIAPaddedOperator:
    """DIA operator on a row mesh acting on stacked local padded slabs.

    Same contract as DIAPaddedOperator (mult2d / pad2d / unpad / mask2d),
    so the jitted Krylov-Schur cycle (eps/ks_jit.py) runs unchanged with
    the basis sharded P(None, ROWS, None).
    """

    def __init__(self, offsets, dp, n, mesh, block_rows=128, mask=None):
        self.offsets = tuple(int(o) for o in offsets)
        self.mesh = mesh
        self.n_interior = int(n)
        self.block_rows = block_rows
        k = mesh.shape[ROWS]
        Rb = block_rows
        B = Rb * W
        self.nblk_loc = -(-self.n_interior // (k * B))
        self.nloc = self.nblk_loc * B
        self.n_pad = k * (self.nblk_loc + 2) * Rb * W
        self.shape = (self.n_pad, self.n_pad)
        self.dp = dp
        self.dtype = dp.dtype
        self.mask = mask if mask is not None else self._make_mask()

    @classmethod
    def from_dia(cls, A, mesh: Optional[Mesh] = None, block_rows: int = 128):
        """Build from a DIAOperator; re-prepares diagonals at the mesh's
        local padding (the single-device dp has different block count)."""
        from ..sys.mesh import get_mesh

        mesh = mesh if mesh is not None else get_mesh()
        if mesh is None:
            raise ValueError("ShardedDIAPaddedOperator needs a row mesh")
        k = mesh.shape[ROWS]
        Rb = block_rows
        B = Rb * W
        n = A.shape[0]
        nblk_loc = -(-n // (k * B))
        n_tot = k * nblk_loc * B
        diags = jnp.asarray(A.diags)
        nd = diags.shape[0]
        dpad = jnp.zeros((nd, n_tot), diags.dtype).at[:, :n].set(diags) \
            .reshape(nd, k * nblk_loc * Rb, W)
        dpad = jax.device_put(dpad, NamedSharding(mesh, P(None, ROWS, None)))
        h = max((abs(o) for o in A.offsets), default=0)
        if h > nblk_loc * B:
            raise ValueError(
                f"halo {h} exceeds the local shard size {nblk_loc * B}")
        gt, gb = _halo_rows(tuple(A.offsets))
        if max(gt, gb) > Rb:
            raise ValueError("offset reach exceeds one halo block")
        return cls(A.offsets, dpad, n, mesh, block_rows)

    # ---- layout helpers --------------------------------------------------
    def _row_sharding(self, ndim=2):
        spec = P(ROWS, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def _make_mask(self):
        k = self.mesh.shape[ROWS]
        Rb = self.block_rows
        nblk = self.nblk_loc
        m = np.zeros((k, (nblk + 2) * Rb * W), dtype=self.dtype)
        flat = np.zeros(k * self.nloc, dtype=self.dtype)
        flat[: self.n_interior] = 1.0
        m[:, Rb * W: (nblk + 1) * Rb * W] = flat.reshape(k, self.nloc)
        m = m.reshape(k * (nblk + 2) * Rb, W)
        return jax.device_put(jnp.asarray(m), self._row_sharding())

    @property
    def nnz(self):
        return int(sum(self.n_interior - abs(o) for o in self.offsets))

    @property
    def mask2d(self):
        return self.mask

    def pad2d(self, x):
        """(n,) -> stacked local padded slabs (k*(nblk+2)*Rb, W)."""
        k = self.mesh.shape[ROWS]
        Rb = self.block_rows
        nblk = self.nblk_loc
        xh = np.zeros(k * self.nloc, dtype=self.dtype)
        xh[: self.n_interior] = np.asarray(x)
        slabs = np.zeros((k, (nblk + 2) * Rb * W), dtype=self.dtype)
        slabs[:, Rb * W: (nblk + 1) * Rb * W] = xh.reshape(k, self.nloc)
        xp = slabs.reshape(k * (nblk + 2) * Rb, W)
        return jax.device_put(jnp.asarray(xp), self._row_sharding())

    def pad(self, x):
        return self.pad2d(x).reshape(-1)

    def unpad(self, xp):
        k = self.mesh.shape[ROWS]
        Rb = self.block_rows
        nblk = self.nblk_loc
        a = np.asarray(xp).reshape(k, (nblk + 2) * Rb * W)
        return a[:, Rb * W: (nblk + 1) * Rb * W].reshape(-1)[: self.n_interior]

    # ---- SpMV --------------------------------------------------------------
    def mult2d(self, xp):
        return dia_spmv_padded_sharded(
            self.offsets, self.dp, xp, nloc=self.nloc,
            block_rows=self.block_rows, mesh=self.mesh)

    def mult(self, x):
        return self.mult2d(x.reshape(-1, W)).reshape(-1)

    mult_h = mult  # symmetric stencils (HEP fast path)


def _tree_flatten(op):
    return (op.dp, op.mask), (op.offsets, op.n_interior, op.mesh,
                              op.block_rows)


def _tree_unflatten(aux, children):
    obj = object.__new__(ShardedDIAPaddedOperator)
    obj.dp, obj.mask = children
    obj.offsets, obj.n_interior, obj.mesh, obj.block_rows = aux
    k = obj.mesh.shape[ROWS]
    Rb = obj.block_rows
    B = Rb * W
    obj.nblk_loc = -(-obj.n_interior // (k * B))
    obj.nloc = obj.nblk_loc * B
    obj.n_pad = k * (obj.nblk_loc + 2) * Rb * W
    obj.shape = (obj.n_pad, obj.n_pad)
    obj.dtype = getattr(obj.dp, "dtype", None)
    return obj


jax.tree_util.register_pytree_node(ShardedDIAPaddedOperator, _tree_flatten,
                                   _tree_unflatten)
