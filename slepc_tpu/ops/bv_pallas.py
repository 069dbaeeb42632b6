"""Pallas TPU kernels for BV panel orthogonalization sweeps.

The Krylov-cycle hot loop is dominated by basis-panel traffic: every CGS
sweep streams the whole (K, R, W) transposed basis once for the dots and
once for the update.  XLA's einsum lowering of these GEMV-shaped
contractions measured ~4x below achievable HBM bandwidth on the round-2
bench (44.5 ms/col vs a ~12 ms byte roofline), so these kernels restate
the sweeps as explicit streaming passes:

  * ``panel_dots``         c[k,m]   = sum_rw V[k]·Wb[m]          (1 read of V)
  * ``panel_update``       Wb[m]   -= sum_k C[k,m] V[k]          (1 read of V)
  * ``panel_update_dots``  both at once: apply C, return the dots
                           of V with the UPDATED panel            (1 read of V)

so a full CGS2 sweep costs 3 basis reads (dots · fused update+dots ·
update) instead of 4, each at stream bandwidth.  The same kernels serve
the blocked (BCGS) extension with b > 1 columns per sweep — the
bandwidth-lean path where the basis is read 3 times per b columns.

Reference semantics anchor: the single-reduction CGS of
src/sys/classes/bv/interface/bvorthog.c:91-132 and the block variants at
bvorthog.c:492-726 (here the "reduction" is free: one chip or GSPMD psum).

Layout contract: V is the transposed padded basis (K, R, W) with
R % 128 == 0 (the DIA padded layout), W = 512 lanes; panels Wb are
(b, R, W).  f32 only (f64 falls back to XLA einsum; the remote Mosaic
compiler rejects native-f64 kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 512  # lane width of the padded 2-D layout (ops/dia_pallas.py)


def _interp() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _pick_rb(K: int, b: int, R: int, nbuf: int) -> int:
    """Largest row-block (multiple of 8, divides R) whose nbuf-way
    buffered working set stays within ~10 MB of VMEM."""
    budget = 10 * 2 ** 20
    for rb in (128, 64, 32, 16, 8):
        if R % rb:
            continue
        if nbuf * (K + 2 * b) * rb * W * 4 <= budget:
            return rb
    return 8


def _dots_kernel(K: int, b: int, v_ref, w_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = v_ref[:]
    for m in range(b):
        wm = w_ref[m]
        out_ref[:, m, :] += jnp.sum(v * wm[None], axis=1)


def panel_dots(V, Wb):
    """C[k, m] = <V[k], Wb[m]> for a (K, R, W) basis and (b, R, W) panel.

    Returns (K, b) f32.  One streaming read of V and Wb; per-lane partial
    sums accumulate in VMEM across the row grid and reduce in XLA.
    """
    K, R, _ = V.shape
    b = Wb.shape[0]
    Rb = _pick_rb(K, b, R, 2)
    grid = R // Rb
    out = pl.pallas_call(
        partial(_dots_kernel, K, b),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, b, W), lambda i: (i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, b, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * b * R * W,
            bytes_accessed=(K + b) * R * W * 4,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(V, Wb)
    return jnp.sum(out, axis=2)


def _update_kernel(K: int, b: int, c_ref, v_ref, w_ref, o_ref):
    v = v_ref[:]
    for m in range(b):
        acc = w_ref[m]
        for k in range(K):
            acc = acc - c_ref[k, m] * v[k]
        o_ref[m] = acc


def panel_update(V, C, Wb):
    """Wb[m] - sum_k C[k, m] V[k]; one streaming read of V and Wb."""
    K, R, _ = V.shape
    b = Wb.shape[0]
    Rb = _pick_rb(K, b, R, 2)
    grid = R // Rb
    return pl.pallas_call(
        partial(_update_kernel, K, b),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, b), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, Rb, W), lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Wb.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * b * R * W,
            bytes_accessed=(K + 2 * b) * R * W * 4,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(C.astype(jnp.float32), V, Wb)


def _update_dots_kernel(K: int, b: int, c_ref, v_ref, w_ref, o_ref, d_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        d_ref[:] = jnp.zeros_like(d_ref)

    v = v_ref[:]
    for m in range(b):
        acc = w_ref[m]
        for k in range(K):
            acc = acc - c_ref[k, m] * v[k]
        o_ref[m] = acc
        d_ref[:, m, :] += jnp.sum(v * acc[None], axis=1)


def panel_update_dots(V, C, Wb):
    """Fused second-CGS-pass: apply C, return (updated panel, dots of V
    with the UPDATED panel) — V is read ONCE for both, cutting CGS2 from
    4 to 3 basis reads."""
    K, R, _ = V.shape
    b = Wb.shape[0]
    Rb = _pick_rb(K, b, R, 2)
    grid = R // Rb
    out, dots = pl.pallas_call(
        partial(_update_dots_kernel, K, b),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, b), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, Rb, W), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, b, W), lambda i: (i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(Wb.shape, jnp.float32),
                   jax.ShapeDtypeStruct((K, b, W), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * K * b * R * W,
            bytes_accessed=(K + 2 * b) * R * W * 4,
            transcendentals=0,
        ),
        interpret=_interp(),
    )(C.astype(jnp.float32), V, Wb)
    return out, jnp.sum(dots, axis=2)


def supported(V) -> bool:
    """Kernel applicability: f32, padded-W layout, row dim tile-aligned."""
    return (V.dtype == jnp.float32 and V.ndim == 3 and V.shape[2] == W
            and V.shape[1] % 8 == 0)
