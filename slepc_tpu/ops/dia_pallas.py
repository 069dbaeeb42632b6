"""Pallas TPU kernel for DIA (diagonal-offset) SpMV.

The DIA SpMV y[i] = sum_k d_k[i] * x[i + off_k] is pure streaming: its
speed of light is HBM bandwidth over ~(4 + 8/ndiag) bytes per nonzero.
The XLA roll-based formulation reaches ~30% of that (each roll is a
materialized copy), so this kernel restructures the computation for the
TPU's 2-D vector layout:

  * the flattened vector is viewed as a (rows, W) matrix, W = 512 lanes;
  * a flattened shift by offset o = q*W + r decomposes EXACTLY into a
    row shift by q (taken from the 3-block neighborhood fed by BlockSpec
    index maps i-1, i, i+1 — auto-double-buffered, no manual DMA) plus a
    lane rotation realized as two static column slices concatenated
    (carry row q+1 supplies the wrapped columns);
  * per diagonal: one multiply-add on the VPU; no gathers, no copies.

Traffic: diags once + x three times + y once; ~75-80% of the format's
ideal bytes for the 5-point stencil, fully pipelined.
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

W = 512  # lane width of the 2-D view


def _interp() -> bool:
    """Run pallas in interpreter mode off-TPU (CPU mesh tests execute the
    same kernel path as jax ops; evaluated at trace time, so each backend
    gets its own compiled variant)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _dia_kernel(offsets: Tuple[int, ...], Rb: int,
                xm_ref, xc_ref, xp_ref, d_ref, y_ref):
    x3 = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=0)  # (3Rb, W)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, W)  # python floor-division: r in [0, W)
        A = x3[Rb + q: 2 * Rb + q, :]
        if r == 0:
            shifted = A
        else:
            # lane rotation with carry from the next row block:
            # shifted[i,j] = A[i,j+r] (j < W-r) else B[i,j+r-W]
            Bq = x3[Rb + q + 1: 2 * Rb + q + 1, :]
            # rotate left by r == rotate right by W - r (shift must be >= 0;
            # int32 scalar: x64 mode would emit an i64 rotate operand)
            shift = np.int32(W - r)
            rollA = pltpu.roll(A, shift, axis=1)
            rollB = pltpu.roll(Bq, shift, axis=1)
            shifted = jnp.where(col < W - r, rollA, rollB)
        term = d_ref[k] * shifted
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def prepare_diags(diags, n: int, block_rows: int = 128):
    """Pad+reshape the diagonal data ONCE at operator setup: done per call
    it would dominate the kernel cost (it is the largest array touched)."""
    nd = diags.shape[0]
    Rb = block_rows
    B = Rb * W
    nblk = -(-n // B)
    npad = nblk * B
    return jnp.zeros((nd, npad), diags.dtype).at[:, :n].set(diags) \
        .reshape(nd, nblk * Rb, W)


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_prepared(offsets: Tuple[int, ...], dp, x, n: int,
                      block_rows: int = 128):
    """y = DIA @ x with pre-prepared diagonal blocks (see prepare_diags)."""
    nd = dp.shape[0]
    Rb = block_rows
    B = Rb * W
    nblk = -(-n // B)
    npad = nblk * B
    xp = jnp.zeros(npad, x.dtype).at[:n].set(x).reshape(nblk * Rb, W)
    # one zero block of rows above and below for the neighbor index maps
    zrows = jnp.zeros((Rb, W), x.dtype)
    xp = jnp.concatenate([zrows, xp, zrows], axis=0)  # ((nblk+2)*Rb, W)

    y = pl.pallas_call(
        partial(_dia_kernel, tuple(offsets), Rb),
        grid=(nblk,),
        in_specs=[
            # NOTE: constants derived from i keep index dtypes uniform
            # (mixed i32/i64 index tuples fail to legalize under x64 mode)
            pl.BlockSpec((Rb, W), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W), lambda i: (i + 1, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W), lambda i: (i + 2, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * Rb, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n,
            bytes_accessed=(dp.size + 4 * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xp, xp, xp, dp)
    return y.reshape(npad)[:n]


def dia_spmv(offsets, diags, x, block_rows: int = 128):
    """Convenience wrapper preparing diagonals per call (benchmarks use
    dia_spmv_prepared with cached preparation)."""
    dp = prepare_diags(diags, x.shape[0], block_rows)
    return dia_spmv_prepared(tuple(offsets), dp, x, x.shape[0], block_rows)


def dia_spmv_supported(offsets: Sequence[int], n: int, dtype,
                       block_rows: int = 128) -> bool:
    """Kernel applicability: TPU backend, offsets fit the neighborhood."""
    h = max((abs(o) for o in offsets), default=0)
    if h >= (block_rows - 1) * W or n < W:
        return False
    if np.dtype(dtype) != np.dtype(np.float32):
        return False  # f64/complex path not yet validated on-device
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _dia_kernel2(offsets: Tuple[int, ...], Rb: int, nblk: int,
                 xm_ref, xc_ref, xp_ref, d_ref, y_ref):
    """Padded-layout variant: grid covers nblk+2 stored blocks; halo
    blocks (first/last) are written as zeros so the OUTPUT is a valid
    padded input for the next application (zero-copy chained SpMV)."""
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        y_ref[:] = jnp.zeros((Rb, W), y_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i <= nblk))
    def _():
        x3 = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
        acc = None
        for k, off in enumerate(offsets):
            q, r = divmod(off, W)
            A = x3[Rb + q: 2 * Rb + q, :]
            if r == 0:
                shifted = A
            else:
                Bq = x3[Rb + q + 1: 2 * Rb + q + 1, :]
                shift = np.int32(W - r)
                rollA = pltpu.roll(A, shift, axis=1)
                rollB = pltpu.roll(Bq, shift, axis=1)
                shifted = jnp.where(col < W - r, rollA, rollB)
            term = d_ref[k] * shifted
            acc = term if acc is None else acc + term
        y_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_padded(offsets: Tuple[int, ...], dp, xp, n: int,
                    block_rows: int = 128):
    """SpMV wholly in the padded layout: xp and the returned yp are
    ((nblk+2)*Rb, W) arrays whose first/last Rb rows are zero halo.

    Eliminates the per-call pad/unpad copies of dia_spmv_prepared — the
    chained-SpMV loops (Krylov extension, filter recurrences, the bench)
    apply it back-to-back at kernel speed.
    """
    nd = dp.shape[0]
    Rb = block_rows
    nblk = -(-n // (Rb * W))
    y = pl.pallas_call(
        partial(_dia_kernel2, tuple(offsets), Rb, nblk),
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec((Rb, W), lambda i: (jnp.maximum(i - 1, i * 0), i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W),
                         lambda i: (jnp.minimum(i + 1, i * 0 + (nblk + 1)), i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, Rb, W),
                         lambda i: (i * 0,
                                    jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                i * 0 + (nblk - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((nblk + 2) * Rb, W), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n,
            bytes_accessed=(dp.size + 3 * n) * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xp, xp, xp, dp)
    return y


def _dia_kernel2b(offsets: Tuple[int, ...], b: int, Rbk: int, ht: int,
                  hb: int, i_lo: int, i_hi: int,
                  xm_ref, xc_ref, xp_ref, d_ref, y_ref):
    """Block (multi-vector) variant of _dia_kernel2: the diagonal data is
    read ONCE per grid step and applied to all b vectors — the b-SpMV of
    the blocked BCGS2 cycle at 1/b of the per-column diagonal traffic
    (a vmap over the single-vector kernel re-reads d_ref per vector).
    Halo operands carry only ht/hb rows (the stencil's true row reach):
    fetching full neighbor blocks blew the 16 MB scoped-VMEM limit at
    b=8, Rb=128 (18.5 MB — compile-time OOM on the r4 bench shape)."""
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i < i_lo, i >= i_hi))
    def _():
        y_ref[:] = jnp.zeros((b, Rbk, W), y_ref.dtype)

    @pl.when(jnp.logical_and(i >= i_lo, i < i_hi))
    def _():
        x3 = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, Rbk, W), 2)
        acc = None
        for k, off in enumerate(offsets):
            q, r = divmod(off, W)
            A = x3[:, ht + q: ht + Rbk + q, :]
            if r == 0:
                shifted = A
            else:
                Bq = x3[:, ht + q + 1: ht + Rbk + q + 1, :]
                shift = np.int32(W - r)
                rollA = pltpu.roll(A, shift, axis=2)
                rollB = pltpu.roll(Bq, shift, axis=2)
                shifted = jnp.where(col < W - r, rollA, rollB)
            term = d_ref[k][None] * shifted
            acc = term if acc is None else acc + term
        y_ref[:] = acc


def _block_halo(offsets: Tuple[int, ...], Rbk: int):
    """(ht, hb) halo row counts for the block kernel: the stencil's true
    row reach rounded up to a divisor of Rbk (index maps address halo
    blocks in ht/hb-row units, so they must tile the Rbk grid).  Returns
    None when the reach exceeds Rbk (kernel inapplicable)."""
    qs = [off // W for off in offsets]
    rs = [off % W for off in offsets]
    need_t = max((-q for q in qs), default=0)
    need_b = max((q + (1 if r else 0) for q, r in zip(qs, rs)), default=0)
    divs = [d for d in (8, 16, 32, 64, 128, 256) if Rbk % d == 0]

    def rnd(g):
        for d in divs:
            if d >= g:
                return d
        return None

    ht, hb = rnd(max(need_t, 1)), rnd(max(need_b, 1))
    if ht is None or hb is None:
        return None
    return ht, hb


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_padded_block(offsets: Tuple[int, ...], dp, Xp, n: int,
                          block_rows: int = 128):
    """Block SpMV in the padded chained layout: Xp (b, (nblk+2)*Rb, W) ->
    Yp same shape, halo blocks zeroed.  Diagonals stream once per block.

    ``block_rows`` is the LAYOUT block size; the kernel grids over Rbk =
    min(64, Rb) sub-blocks (Rbk | Rb keeps every index map integral) with
    ht/hb-row halo operands, bounding VMEM per grid step to
    ~2*(b*(Rbk + ht + hb) + b*Rbk + nd*Rbk)*W*4 bytes (~7 MB at b=8,
    Rbk=64, 5 diagonals).  Falls back to a vmap of the single-vector
    kernel when the stencil's row reach exceeds Rbk (e.g. 3-D operators
    with |offset| >= Rbk*W)."""
    nd = dp.shape[0]
    b = Xp.shape[0]
    Rb = block_rows
    nblk = -(-n // (Rb * W))
    Rbk = 64 if Rb % 64 == 0 else Rb
    halo = _block_halo(tuple(offsets), Rbk)
    if halo is None:
        # stencil reach exceeds the sub-block: vmap the single-vector
        # kernel (diagonal re-reads return, but correctness is kept)
        return jax.vmap(
            lambda x: dia_spmv_padded(tuple(offsets), dp, x, n, Rb))(Xp)
    ht, hb = halo
    sub = Rb // Rbk                    # sub-blocks per layout block
    ngrid = (nblk + 2) * sub
    i_lo, i_hi = sub, sub + nblk * sub  # interior sub-block range
    nrows = (nblk + 2) * Rb

    y = pl.pallas_call(
        partial(_dia_kernel2b, tuple(offsets), b, Rbk, ht, hb, i_lo, i_hi),
        grid=(ngrid,),
        in_specs=[
            # top halo: rows [i*Rbk - ht, i*Rbk), in ht-row units
            pl.BlockSpec((b, ht, W),
                         lambda i: (i * 0,
                                    jnp.maximum(i * (Rbk // ht) - 1, i * 0),
                                    i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Rbk, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            # bottom halo: rows [(i+1)*Rbk, (i+1)*Rbk + hb), in hb units
            pl.BlockSpec((b, hb, W),
                         lambda i: (i * 0,
                                    jnp.minimum((i + 1) * (Rbk // hb),
                                                i * 0 + (nrows // hb - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, Rbk, W),
                         lambda i: (i * 0,
                                    jnp.minimum(
                                        jnp.maximum(i - sub, i * 0),
                                        i * 0 + (nblk * sub - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, Rbk, W), lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nrows, W), Xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n * b,
            bytes_accessed=(dp.size + 3 * n * b) * Xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(Xp, Xp, Xp, dp)
    return y


def _halo_rows(offsets: Tuple[int, ...]) -> Tuple[int, int]:
    """Rows of x needed above/below the center block: q=floor(off/W) row
    shifts plus one carry row for the lane rotation."""
    qs = [off // W for off in offsets]
    rs = [off % W for off in offsets]
    gt = max((-q for q in qs), default=0)
    gb = max((q + (1 if r else 0) for q, r in zip(qs, rs)), default=0)
    gb = max(gb, max((q for q in qs), default=0))

    def rnd(g):  # f32 sublane tile = 8 rows; keep halo blocks tile-aligned
        return max(8, -(-g // 8) * 8)

    return rnd(gt) if gt else 8, rnd(gb) if gb else 8


def _dia_kernel3(offsets: Tuple[int, ...], Rb: int, gt: int, gb: int,
                 xt_ref, xc_ref, xb_ref, d_ref, y_ref):
    """Narrow-halo variant: reads only gt+gb extra rows of x per block
    instead of two full neighbor blocks, cutting x traffic from 3x to
    ~(1 + (gt+gb)/Rb)x — the dominant saving for wide blocks."""
    x3 = jnp.concatenate([xt_ref[:], xc_ref[:], xb_ref[:]], axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
    acc = None
    for k, off in enumerate(offsets):
        q, r = divmod(off, W)
        A = x3[gt + q: gt + q + Rb, :]
        if r == 0:
            shifted = A
        else:
            Bq = x3[gt + q + 1: gt + q + 1 + Rb, :]
            shift = np.int32(W - r)
            rollA = pltpu.roll(A, shift, axis=1)
            rollB = pltpu.roll(Bq, shift, axis=1)
            shifted = jnp.where(col < W - r, rollA, rollB)
        term = d_ref[k] * shifted
        acc = term if acc is None else acc + term
    y_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_prepared_v3(offsets: Tuple[int, ...], dp, x, n: int,
                         block_rows: int = 128):
    """y = DIA @ x, narrow-halo kernel (see _dia_kernel3)."""
    nd = dp.shape[0]
    Rb = block_rows
    gt, gb = _halo_rows(tuple(offsets))
    B = Rb * W
    nblk = -(-n // B)
    npad = nblk * B
    xp = jnp.zeros(npad, x.dtype).at[:n].set(x).reshape(nblk * Rb, W)
    zrows = jnp.zeros((Rb, W), x.dtype)
    xp = jnp.concatenate([zrows, xp, zrows], axis=0)  # ((nblk+2)*Rb, W)
    rt, rbq = Rb // gt, Rb // gb

    y = pl.pallas_call(
        partial(_dia_kernel3, tuple(offsets), Rb, gt, gb),
        grid=(nblk,),
        in_specs=[
            # top halo: gt rows ending at the center block start
            pl.BlockSpec((gt, W), lambda i: ((i + 1) * rt - 1, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W), lambda i: (i + 1, i * 0),
                         memory_space=pltpu.VMEM),
            # bottom halo: gb rows starting at the center block end
            pl.BlockSpec((gb, W), lambda i: ((i + 2) * rbq, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * Rb, W), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n,
            bytes_accessed=(dp.size + 2 * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xp, xp, xp, dp)
    return y.reshape(npad)[:n]


def _dia_kernel3p(offsets: Tuple[int, ...], Rb: int, gt: int, gb: int,
                  nblk: int, xt_ref, xc_ref, xb_ref, d_ref, y_ref):
    """Narrow-halo + padded-layout: halo output blocks are zeroed so the
    output chains as the next input (see _dia_kernel2)."""
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        y_ref[:] = jnp.zeros((Rb, W), y_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i <= nblk))
    def _():
        x3 = jnp.concatenate([xt_ref[:], xc_ref[:], xb_ref[:]], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
        acc = None
        for k, off in enumerate(offsets):
            q, r = divmod(off, W)
            A = x3[gt + q: gt + q + Rb, :]
            if r == 0:
                shifted = A
            else:
                Bq = x3[gt + q + 1: gt + q + 1 + Rb, :]
                shift = np.int32(W - r)
                rollA = pltpu.roll(A, shift, axis=1)
                rollB = pltpu.roll(Bq, shift, axis=1)
                shifted = jnp.where(col < W - r, rollA, rollB)
            term = d_ref[k] * shifted
            acc = term if acc is None else acc + term
        y_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_padded_v3(offsets: Tuple[int, ...], dp, xp, n: int,
                       block_rows: int = 128):
    """Chained-layout SpMV with narrow-halo reads (drop-in for
    dia_spmv_padded; same ((nblk+2)*Rb, W) in/out layout)."""
    nd = dp.shape[0]
    Rb = block_rows
    gt, gb = _halo_rows(tuple(offsets))
    nblk = -(-n // (Rb * W))
    rt, rbq = Rb // gt, Rb // gb
    top_max = (nblk + 2) * rt - 1
    bot_max = (nblk + 2) * rbq - 1
    y = pl.pallas_call(
        partial(_dia_kernel3p, tuple(offsets), Rb, gt, gb, nblk),
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec((gt, W),
                         lambda i: (jnp.clip(i * rt - 1, i * 0, i * 0 + top_max),
                                    i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, W),
                         lambda i: (jnp.clip((i + 1) * rbq, i * 0,
                                             i * 0 + bot_max), i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, Rb, W),
                         lambda i: (i * 0,
                                    jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                i * 0 + (nblk - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((nblk + 2) * Rb, W), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n,
            bytes_accessed=(dp.size + 2 * n) * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xp, xp, xp, dp)
    return y


def narrow_halo_ok(offsets: Sequence[int], block_rows: int) -> bool:
    """v3 applicability: halo fits inside one block and divides it."""
    gt, gb = _halo_rows(tuple(offsets))
    return (gt <= block_rows and gb <= block_rows
            and block_rows % gt == 0 and block_rows % gb == 0)


def pad_vec(x, n: int, block_rows: int = 128):
    """x (n,) -> padded layout ((nblk+2)*Rb, W)."""
    Rb = block_rows
    B = Rb * W
    nblk = -(-n // B)
    xp = jnp.zeros(((nblk + 2) * Rb, W), x.dtype)
    body = jnp.zeros(nblk * B, x.dtype).at[:n].set(x).reshape(nblk * Rb, W)
    return jax.lax.dynamic_update_slice(xp, body, (Rb, 0))


def unpad_vec(xp, n: int, block_rows: int = 128):
    Rb = block_rows
    return xp[Rb:, :].reshape(-1)[:n]


@register_pytree_node_class
class DIAPaddedOperator:
    """DIA operator acting on padded-layout vectors (see dia_spmv_padded).

    Used by the jitted Krylov fast path: vectors stay in the padded
    ((nblk+2)*Rb*W,) flat layout for the whole solve, so every SpMV runs
    the zero-copy kernel.  The operator annihilates the halo (output halo
    is written zero), so the padded operator's spectrum is spec(A) plus
    zeros on the halo subspace — callers must keep basis vectors
    halo-free (mask available via ``interior_mask``).
    """

    def __init__(self, offsets, dp, n, block_rows=128, mask=None):
        self.offsets = tuple(offsets)
        self.dp = dp
        self.n_interior = n
        self.block_rows = block_rows
        Rb = block_rows
        nblk = -(-n // (Rb * W))
        self.n_pad = (nblk + 2) * Rb * W
        self.shape = (self.n_pad, self.n_pad)
        self.dtype = dp.dtype
        self.mask = mask if mask is not None else self._make_mask()

    @classmethod
    def from_dia(cls, A, block_rows: int = 128):
        dp = A.dp if A.dp is not None else prepare_diags(
            A.diags, A.shape[0], block_rows)
        return cls(A.offsets, dp, A.shape[0], block_rows)

    def _make_mask(self):
        Rb = self.block_rows
        nblk = -(-self.n_interior // (Rb * W))
        m = jnp.zeros(self.n_pad, dtype=self.dtype)
        interior = jnp.zeros(nblk * Rb * W, self.dtype).at[: self.n_interior].set(1.0)
        return jax.lax.dynamic_update_slice(m, interior, (Rb * W,))

    @property
    def nnz(self):
        return int(sum(self.n_interior - abs(o) for o in self.offsets))

    def mult2d(self, xp):
        """SpMV on the 2-D padded view ((nblk+2)*Rb, W) — the zero-copy
        path: a flat<->2-D reshape at the pallas boundary costs a tiled
        relayout copy (~0.4 ms at 8.4M rows), so hot loops must keep
        vectors 2-D end to end."""
        Rb = self.block_rows
        if narrow_halo_ok(self.offsets, Rb):
            return dia_spmv_padded_v3(self.offsets, self.dp, xp,
                                      self.n_interior, Rb)
        return dia_spmv_padded(self.offsets, self.dp, xp,
                               self.n_interior, Rb)

    def mult(self, x):
        return self.mult2d(x.reshape(-1, W)).reshape(-1)

    mult_h = mult  # symmetric use only (HEP fast path)

    def mult2d_block(self, Xp):
        """Block SpMV on (b, rows, W): diagonals stream ONCE for all b
        columns (the blocked BCGS2 cycle's bandwidth lever; a vmap of
        mult2d re-reads them per column)."""
        return dia_spmv_padded_block(self.offsets, self.dp, Xp,
                                     self.n_interior, self.block_rows)

    def pad(self, x):
        return pad_vec(jnp.asarray(x, self.dtype), self.n_interior,
                       self.block_rows).reshape(-1)

    def pad2d(self, x):
        return pad_vec(jnp.asarray(x, self.dtype), self.n_interior,
                       self.block_rows)

    @property
    def mask2d(self):
        return self.mask.reshape(-1, W)

    def unpad(self, xp):
        return unpad_vec(xp.reshape(-1, W), self.n_interior, self.block_rows)

    def tree_flatten(self):
        return (self.dp, self.mask), (self.offsets, self.n_interior,
                                      self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.dp, obj.mask = children
        obj.offsets, obj.n_interior, obj.block_rows = aux
        Rb = obj.block_rows
        nblk = -(-obj.n_interior // (Rb * W))
        obj.n_pad = (nblk + 2) * Rb * W
        obj.shape = (obj.n_pad, obj.n_pad)
        obj.dtype = getattr(obj.dp, "dtype", None)
        return obj


# ---------------------------------------------------------------------------
# Double-single (two-float32 compensated) DIA SpMV: the f64 fast path.
#
# The remote Mosaic compiler rejects f64 kernels, so f64 operators run the
# kernel in double-single arithmetic: every value is an UNEVALUATED SUM
# hi + lo of two f32 (~49-bit effective mantissa, rel. err ~2e-15 — enough
# for the reference's default 1e-8 tolerance, include/slepcmath.h:25).
# Products use Dekker splitting (no FMA dependence), sums Knuth two-sum.
# All error-free transforms stay inside one pallas kernel, where Mosaic
# performs no unsafe floating-point reassociation (validated on-device
# against the XLA f64 roll path in bench.py).
# ---------------------------------------------------------------------------


def _fast_two_sum(a, b):
    """a + b as (s, err), requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split32(a):
    """Dekker split: a = hi + lo with hi having 12 trailing zero bits."""
    c = np.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split32(a)
    bh, bl = _split32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _ds_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _fast_two_sum(p, e)


def _ds_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    return _fast_two_sum(s, e)


def _dia_kernel_ds(offsets: Tuple[int, ...], Rb: int, nblk: int,
                   xmh_ref, xch_ref, xph_ref, xml_ref, xcl_ref, xpl_ref,
                   dh_ref, dl_ref, yh_ref, yl_ref):
    """Padded-layout double-single variant of _dia_kernel2."""
    i = pl.program_id(0)

    @pl.when(jnp.logical_or(i == 0, i == nblk + 1))
    def _():
        yh_ref[:] = jnp.zeros((Rb, W), yh_ref.dtype)
        yl_ref[:] = jnp.zeros((Rb, W), yl_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i <= nblk))
    def _():
        x3h = jnp.concatenate([xmh_ref[:], xch_ref[:], xph_ref[:]], axis=0)
        x3l = jnp.concatenate([xml_ref[:], xcl_ref[:], xpl_ref[:]], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
        acc_h = acc_l = None
        for k, off in enumerate(offsets):
            q, r = divmod(off, W)

            def shifted(x3):
                A = x3[Rb + q: 2 * Rb + q, :]
                if r == 0:
                    return A
                Bq = x3[Rb + q + 1: 2 * Rb + q + 1, :]
                shift = np.int32(W - r)
                return jnp.where(col < W - r, pltpu.roll(A, shift, axis=1),
                                 pltpu.roll(Bq, shift, axis=1))

            sh, sl = shifted(x3h), shifted(x3l)
            th, tl = _ds_mul(dh_ref[k], dl_ref[k], sh, sl)
            if acc_h is None:
                acc_h, acc_l = th, tl
            else:
                acc_h, acc_l = _ds_add(acc_h, acc_l, th, tl)
        yh_ref[:] = acc_h
        yl_ref[:] = acc_l


@partial(jax.jit, static_argnames=("offsets", "n", "block_rows"))
def dia_spmv_padded_ds(offsets: Tuple[int, ...], dph, dpl, xph, xpl, n: int,
                       block_rows: int = 128):
    """Double-single SpMV in the padded chained layout.

    (xph, xpl) and the returned (yph, ypl) are hi/lo f32 pairs of the
    ((nblk+2)*Rb, W) layout; halo blocks zeroed in the output.
    """
    nd = dph.shape[0]
    Rb = block_rows
    nblk = -(-n // (Rb * W))

    def xspec(doff):
        if doff < 0:
            return pl.BlockSpec((Rb, W), lambda i: (jnp.maximum(i - 1, i * 0),
                                                    i * 0),
                                memory_space=pltpu.VMEM)
        if doff > 0:
            return pl.BlockSpec(
                (Rb, W), lambda i: (jnp.minimum(i + 1, i * 0 + (nblk + 1)),
                                    i * 0), memory_space=pltpu.VMEM)
        return pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    dspec = pl.BlockSpec((nd, Rb, W),
                         lambda i: (i * 0,
                                    jnp.minimum(jnp.maximum(i - 1, i * 0),
                                                i * 0 + (nblk - 1)),
                                    i * 0),
                         memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        partial(_dia_kernel_ds, tuple(offsets), Rb, nblk),
        grid=(nblk + 2,),
        in_specs=[xspec(-1), xspec(0), xspec(+1),
                  xspec(-1), xspec(0), xspec(+1), dspec, dspec],
        out_specs=(pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rb, W), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(((nblk + 2) * Rb, W), jnp.float32),
                   jax.ShapeDtypeStruct(((nblk + 2) * Rb, W), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=60 * nd * n,
            bytes_accessed=(2 * dph.size + 6 * n) * 4,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(xph, xph, xph, xpl, xpl, xpl, dph, dpl)
    return yh, yl


def ds_split(x):
    """f64 array -> (hi, lo) f32 pair with x == hi + lo exactly."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def ds_join(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


@register_pytree_node_class
class DIAPaddedOperatorDS:
    """f64 DIA operator running the double-single Pallas kernel.

    mult2d takes/returns f64 padded-layout arrays; the hi/lo split and
    join live inside the same jit so XLA fuses them around the kernel.
    Same contract as DIAPaddedOperator (the jitted KS cycle runs its
    basis arithmetic in XLA-emulated f64; only the SpMV is the kernel).
    """

    def __init__(self, offsets, dph, dpl, n, block_rows=128, mask=None):
        self.offsets = tuple(offsets)
        self.dph, self.dpl = dph, dpl
        self.n_interior = int(n)
        self.block_rows = block_rows
        Rb = block_rows
        nblk = -(-self.n_interior // (Rb * W))
        self.n_pad = (nblk + 2) * Rb * W
        self.shape = (self.n_pad, self.n_pad)
        self.dtype = np.dtype(np.float64)
        self.mask = mask if mask is not None else self._make_mask()

    @classmethod
    def from_dia(cls, A, block_rows: int = 128):
        diags64 = jnp.asarray(A.diags, jnp.float64)
        hi, lo = ds_split(diags64)
        return cls(A.offsets, prepare_diags(hi, A.shape[0], block_rows),
                   prepare_diags(lo, A.shape[0], block_rows),
                   A.shape[0], block_rows)

    def _make_mask(self):
        Rb = self.block_rows
        nblk = -(-self.n_interior // (Rb * W))
        m = jnp.zeros(self.n_pad, dtype=self.dtype)
        interior = jnp.zeros(nblk * Rb * W, self.dtype) \
            .at[: self.n_interior].set(1.0)
        m = jax.lax.dynamic_update_slice(m, interior, (Rb * W,))
        return m.reshape(-1, W)

    @property
    def nnz(self):
        return int(sum(self.n_interior - abs(o) for o in self.offsets))

    @property
    def mask2d(self):
        return self.mask

    def mult2d(self, xp):
        xh, xl = ds_split(xp)
        yh, yl = dia_spmv_padded_ds(self.offsets, self.dph, self.dpl,
                                    xh, xl, self.n_interior, self.block_rows)
        return ds_join(yh, yl)

    def mult(self, x):
        return self.mult2d(x.reshape(-1, W)).reshape(-1)

    mult_h = mult

    def pad2d(self, x):
        return pad_vec(jnp.asarray(x, self.dtype), self.n_interior,
                       self.block_rows)

    def pad(self, x):
        return self.pad2d(x).reshape(-1)

    def unpad(self, xp):
        return unpad_vec(xp.reshape(-1, W), self.n_interior, self.block_rows)

    def tree_flatten(self):
        return (self.dph, self.dpl, self.mask), \
            (self.offsets, self.n_interior, self.block_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.dph, obj.dpl, obj.mask = children
        obj.offsets, obj.n_interior, obj.block_rows = aux
        Rb = obj.block_rows
        nblk = -(-obj.n_interior // (Rb * W))
        obj.n_pad = (nblk + 2) * Rb * W
        obj.shape = (obj.n_pad, obj.n_pad)
        obj.dtype = np.dtype(np.float64)
        return obj
