"""Jit-compiled Krylov factorization loops (the hot path).

Reference: BVMatArnoldi / BVMatLanczos (src/sys/classes/bv/interface/
bvkrylov.c:56-226): per column j apply the operator then orthonormalize,
harvesting Hessenberg/tridiagonal coefficients.

TPU design: the whole extension from column k to m is ONE jitted
``lax.fori_loop`` — per step: one operator apply (SpMV) + a CGS2
orthogonalization whose reductions are two fused masked GEMVs (two psums
when sharded).  Column windows are realized with iota masks so a single
compiled program serves every (k, m) restart window — no per-column Python
dispatch, no recompiles across restarts.

Full reorthogonalization is used for both Arnoldi and Lanczos (the
reference's BVMatLanczos also does full reorth through
BVOrthonormalizeColumn); the Lanczos tridiagonal is read off the projected
coefficients.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nc", "passes"))
def arnoldi_extend(op, V, H, k, m, nc: int = 0, Bop=None, omega=None,
                   key=None, passes: int = 2):
    """Extend an Arnoldi factorization A V_k = V_k H_k from k to m columns.

    Args:
      op:   LinearOperator pytree (the possibly ST-transformed operator).
      V:    (n, nc + mmax+1) physical basis array; columns [0, nc+k) filled
            (nc constraint columns first), column nc+k used as workspace.
      H:    (mmax+1, mmax) upper-Hessenberg coefficient array.
      k, m: extend columns [k, m) (traced scalars — no recompile per window).
      nc:   number of leading constraint columns (static).
      Bop:  optional inner-product operator (B metric, GHEP).
      omega: optional (nc+mmax+1,) signature for indefinite metrics
            (pseudo-Lanczos, GHIEP); updated and returned.
      key:  PRNG key for breakdown restarts (deterministic).
    Returns:
      (V, H, beta, breakdown, omega) — beta = H[m, m-1] before the last
      normalization (residual norm), breakdown True if a linear dependence
      forced a random restart vector.
    """
    n, mphys = V.shape
    rdtype = jnp.zeros((), V.dtype).real.dtype
    eps = jnp.finfo(rdtype).eps
    if key is None:
        key = jax.random.PRNGKey(0)

    def ip(x):
        return x if Bop is None else Bop.mult(x)

    def body(j, state):
        V, H, brk, omega = state
        v = V[:, nc + j]  # w = A v_j, v_j the latest basis column
        w = op.mult(v)
        mask = (jnp.arange(mphys) < nc + j + 1).astype(rdtype)

        # CGS with fused single-reduction + unconditional refinement passes
        Bw = ip(w)
        c = (V.conj().T @ Bw) * mask
        h = c if omega is None else c * omega
        nrm_before = jnp.sqrt(jnp.abs(jnp.real(jnp.vdot(w, Bw))))
        w = w - V @ h
        c_tot = c
        for _ in range(passes - 1):
            Bw = ip(w)
            c2 = (V.conj().T @ Bw) * mask
            h2 = c2 if omega is None else c2 * omega
            w = w - V @ h2
            c_tot = c_tot + c2
        Bw = ip(w)
        nsq = jnp.real(jnp.vdot(w, Bw))
        sgn = jnp.where(nsq >= 0, 1.0, -1.0).astype(rdtype)
        beta = jnp.sqrt(jnp.abs(nsq))

        # breakdown: residual tiny relative to pre-projection norm
        is_brk = beta < eps ** 0.75 * (nrm_before + eps)
        rnd = jax.random.normal(jax.random.fold_in(key, j), (n,), rdtype).astype(V.dtype)
        # orthogonalize replacement vector (one CGS2, only used on breakdown)
        rc = (V.conj().T @ ip(rnd)) * mask
        rnd = rnd - V @ (rc if omega is None else rc * omega)
        rc2 = (V.conj().T @ ip(rnd)) * mask
        rnd = rnd - V @ (rc2 if omega is None else rc2 * omega)
        rbeta = jnp.sqrt(jnp.abs(jnp.real(jnp.vdot(rnd, ip(rnd)))))
        w = jnp.where(is_brk, rnd, w)
        beta_eff = jnp.where(is_brk, rbeta, beta)
        safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
        V = V.at[:, nc + j + 1].set(w / safe)

        # Hessenberg column j: projection coeffs (logical rows) + beta
        col = jnp.zeros((H.shape[0],), dtype=H.dtype)
        col = col.at[: H.shape[0] - 1].set(c_tot[nc: nc + H.shape[0] - 1])
        bval = (sgn * beta).astype(rdtype)
        col = jax.lax.dynamic_update_index_in_dim(
            col, jnp.where(is_brk, 0.0, bval).astype(H.dtype), j + 1, 0)
        H = H.at[:, j].set(col)
        if omega is not None:
            omega = jax.lax.dynamic_update_index_in_dim(
                omega, sgn.astype(omega.dtype), nc + j + 1, 0)
        return V, H, brk | is_brk, omega

    V, H, brk, omega = jax.lax.fori_loop(
        k, m, body, (V, H, jnp.array(False), omega))
    beta = jnp.abs(H[m, m - 1])
    return V, H, beta, brk, omega


def lanczos_extend(op, V, alpha, beta_arr, k, m, nc: int = 0, Bop=None,
                   omega=None, key=None):
    """Hermitian Lanczos with full reorthogonalization.

    Runs the Arnoldi kernel (full reorth ≡ numerically exact Lanczos) and
    extracts alpha[j] = H[j,j], beta[j] = H[j+1,j].  Returns
    (V, alpha, beta_arr, beta_m, breakdown, omega).
    """
    mmax = alpha.shape[0]
    H = jnp.zeros((mmax + 1, mmax), dtype=V.dtype)
    H = _tridiag_to_hess(H, alpha, beta_arr, k)
    V, H, beta, brk, omega = arnoldi_extend(op, V, H, k, m, nc, Bop, omega, key)
    alpha = jnp.real(jnp.diagonal(H)[:mmax]).astype(alpha.dtype)
    beta_arr = jnp.real(jnp.diagonal(H, -1)[:mmax]).astype(beta_arr.dtype)
    return V, alpha, beta_arr, beta, brk, omega


@jax.jit
def _tridiag_to_hess(H, alpha, beta_arr, k):
    mmax = alpha.shape[0]
    idx = jnp.arange(mmax)
    active = idx < k
    H = H.at[idx, idx].set(jnp.where(active, alpha, 0.0).astype(H.dtype))
    H = H.at[idx + 1, idx].set(jnp.where(active, beta_arr, 0.0).astype(H.dtype))
    H = H.at[idx[:-1], idx[:-1] + 1].set(
        jnp.where(active[:-1], beta_arr[:-1], 0.0).astype(H.dtype))
    return H


@partial(jax.jit, static_argnames=("passes",))
def _orth_col(V, mask, w, Bop=None, omega=None, passes: int = 2):
    """Jitted single-column CGS orthogonalization (host-loop building block)."""
    from . import orthog as _o

    return _o.orthogonalize_vec(V, mask, w, None if Bop is None else Bop.mult,
                                omega, passes=passes)


def arnoldi_extend_host(op, V, H, k, m, nc: int = 0, Bop=None, omega=None,
                        key=None, passes: int = 2):
    """Host-orchestrated Arnoldi extension for operators whose apply cannot
    sit inside jit (host direct solves behind shift-and-invert; the axon
    TPU plugin has no host-callback support).  Per column: one eager
    operator apply + one jitted fused orthogonalization.  Same contract as
    arnoldi_extend.
    """
    import numpy as np

    n, mphys = V.shape
    rdtype = jnp.zeros((), V.dtype).real.dtype
    eps = float(jnp.finfo(rdtype).eps)
    Hh = np.array(H, copy=True)
    rng = np.random.default_rng(4321)
    brk = False
    k_i, m_i = int(k), int(m)
    for j in range(k_i, m_i):
        v = V[:, nc + j]
        w = op.mult(v)
        mask = (jnp.arange(mphys) < nc + j + 1).astype(rdtype)
        w, c_tot, nb, na = _orth_col(V, mask, w, Bop, omega, passes=passes)
        beta = float(jnp.real(na))
        sgn = 1.0 if beta >= 0 else -1.0
        beta_abs = abs(beta)
        if beta_abs < eps ** 0.75 * (abs(float(jnp.real(nb))) + eps):
            brk = True
            rnd = jnp.asarray(rng.standard_normal(n), dtype=V.dtype)
            rnd, _, _, na2 = _orth_col(V, mask, rnd, Bop, omega, passes=passes)
            beta_abs = abs(float(jnp.real(na2)))
            w = rnd
            Hh[j + 1, j] = 0.0
        else:
            Hh[j + 1, j] = sgn * beta_abs
        safe = beta_abs if beta_abs > 0 else 1.0
        V = V.at[:, nc + j + 1].set(w / safe)
        coeffs = np.asarray(c_tot[nc: nc + j + 1])
        Hh[: j + 1, j] = coeffs
        if brk:
            Hh[j + 1, j] = 0.0
        if omega is not None:
            om = np.array(omega, copy=True)
            om[nc + j + 1] = sgn
            omega = jnp.asarray(om)
    beta_out = abs(Hh[m_i, m_i - 1]) if m_i > 0 else 0.0
    return V, jnp.asarray(Hh, dtype=H.dtype), jnp.asarray(beta_out), \
        jnp.asarray(brk), omega


def extend_dispatch(op, V, H, k, m, nc=0, Bop=None, omega=None, key=None):
    """Choose the jitted or host extension based on the operator's
    host-callback requirement."""
    from ..sys.events import log_enabled, log_event

    nnz = getattr(op, "nnz", 2 * V.shape[0])
    flops = (m - k) * (2 * nnz + 8.0 * V.shape[0] * m)  # SpMV + CGS2
    with log_event("BV_MatArnoldi", flops=flops):
        if getattr(op, "host_callback", False):
            out = arnoldi_extend_host(op, V, H, k, m, nc, Bop, omega, key)
        else:
            out = arnoldi_extend(op, V, H, k, m, nc, Bop, omega, key)
        if log_enabled():
            import jax

            jax.block_until_ready(out[0])
        return out
