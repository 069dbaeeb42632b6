"""Double-single Pallas kernel for the f64 restart rotation.

The Krylov-Schur restart rotates the kept basis rows:

    Vout[p] = sum_k Q[k, p] * V[k]        (BVMultInPlace role,
                                           bvops.c BVMultInPlace)

On TPU, f64 is emulated: XLA lowers a dot_general on a multi-GB f64
operand by materializing (8, ...) f32 split-product temporaries in HBM
— measured 280-340 ms for a (48, 2.1M)-row rotation whose honest byte
floor is ~10-20 ms (tools/DIAG_NOTES.md round-5: chunking and einsum
variants all sit on the same emulation floor, and the f32-plane matmul
alternatives cap at ~1e-7 error, which floors tol_b locking).

This kernel instead keeps every split in VMEM/registers: operands are
double-single (hi, lo) f32 pairs (~49-bit mantissa), products use
Dekker splitting and sums Knuth two-sum — the same error-free
transforms as the DS SpMV kernel (`dia_pallas.py`, validated at
~2e-15 on device; the remote Mosaic compiler rejects native f64
kernels outright, so DS is the only in-kernel f64 tier).

Layout: grid = (row-blocks, P) with p innermost, so Mosaic's pipeline
fetches each (K, Rb, W) basis tile ONCE per row block and sweeps all P
output rows from VMEM; Q rides in SMEM as two small f32 planes and is
read as dynamic scalars q[k, program_id(1)].  Accumulation error over
K <= 64 terms is ~K * 2^-49 ~ 1e-13 worst case, measured ~1e-15 rel
(test_round5.py) — inside the tol_b=1e-13 locking floor that killed
the f32-plane rotation modes.

Opt-in via ``rot_mode="ds"`` on the jitted cycles (exact f64 stays the
default); reference role: BVMultInPlace restart update
(src/sys/classes/bv/interface/bvops.c) under krylovschur.c restarts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dia_pallas import _ds_add, _ds_mul, _split32, _two_sum, _fast_two_sum

__all__ = ["rotate_basis_ds"]


def _rotate_kernel(K: int, qh_ref, ql_ref, vh_ref, vl_ref, yh_ref, yl_ref):
    """One (Rb, W) output tile of row p = program_id(1): DS-accumulated
    sum over the K resident basis rows."""
    p = pl.program_id(1)
    acc_h = jnp.zeros(yh_ref.shape[1:], jnp.float32)
    acc_l = jnp.zeros(yl_ref.shape[1:], jnp.float32)
    for k in range(K):  # static unroll: VMEM-resident (Rb, W) tiles
        qh = qh_ref[k, p]
        ql = ql_ref[k, p]
        th, tl = _ds_mul(qh, ql, vh_ref[k], vl_ref[k])
        acc_h, acc_l = _ds_add(acc_h, acc_l, th, tl)
    yh_ref[0] = acc_h
    yl_ref[0] = acc_l


# plane-temporary budget: the (hi, lo) f32 splits of a row chunk live in
# HBM only for that chunk's kernel call, bounding transient memory the
# same way ks_jit._ROT_CHUNK_BYTES bounds the XLA-emulation temporaries
# (a 10M-row ncv=64 basis would otherwise add ~10 GB of planes on top
# of the 5.4 GB f64 basis and OOM a 16 GB chip)
_PLANE_CHUNK_BYTES = 1 << 29


def _rotate_ds_once(Q, Vc, Rb: int, interpret: bool):
    K, P = Q.shape
    _, R, W = Vc.shape
    nblk = R // Rb
    Vh = Vc.astype(jnp.float32)
    Vl = (Vc - Vh.astype(Vc.dtype)).astype(jnp.float32)
    Qh = Q.astype(jnp.float32)
    Ql = (Q - Qh.astype(Q.dtype)).astype(jnp.float32)
    vspec = pl.BlockSpec((K, Rb, W), lambda i, p: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((K, P), lambda i, p: (i * 0, i * 0),
                         memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((1, Rb, W), lambda i, p: (p, i, i * 0),
                         memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        partial(_rotate_kernel, K),
        grid=(nblk, P),  # p innermost: the V tile loads once per block
        in_specs=[qspec, qspec, vspec, vspec],
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((P, R, W), jnp.float32),
                   jax.ShapeDtypeStruct((P, R, W), jnp.float32)),
        interpret=interpret,
    )(Qh, Ql, Vh, Vl)
    return yh.astype(Vc.dtype) + yl.astype(Vc.dtype)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def rotate_basis_ds(Q, V, block_rows: int = 16, interpret: bool = False):
    """Vout = einsum('kp,krw->prw', Q, V) in double-single f32, f64 in/out.

    Q (K, P) and V (K, R, W) are f64; the split to (hi, lo) f32 planes
    and the final recombination are cheap XLA elementwise ops — only
    the contraction itself runs in the kernel, so no 8-way emulation
    temporaries ever touch HBM.  Large bases run in static row chunks
    so the transient plane pairs stay ~<= 1 GB.
    """
    K, P = Q.shape
    Kv, R, W = V.shape
    assert Kv == K, (Kv, K)
    Rb = block_rows
    while R % Rb:
        Rb //= 2

    plane_bytes = 2 * K * R * W * 4
    if plane_bytes <= 2 * _PLANE_CHUNK_BYTES:
        return _rotate_ds_once(Q, V, Rb, interpret)
    nch = -(-plane_bytes // (2 * _PLANE_CHUNK_BYTES))
    rows_per = max(Rb, (-(-R // nch) + Rb - 1) // Rb * Rb)
    out = jnp.zeros((P, R, W), V.dtype)
    s = 0
    while s < R:  # static chunk boundaries, unrolled (uneven tail ok)
        e = min(s + rows_per, R)
        rb = Rb
        while (e - s) % rb:
            rb //= 2
        out = jax.lax.dynamic_update_slice_in_dim(
            out, _rotate_ds_once(Q, V[:, s:e], rb, interpret), s, axis=1)
        s = e
    return out
