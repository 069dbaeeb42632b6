"""Orthogonalization kernels on raw (n, m) basis arrays — all jittable.

The TPU re-design of the reference's BV orthogonalization engine
(reference: src/sys/classes/bv/interface/bvorthog.c):

  * Column orthogonalization is classical Gram-Schmidt with the *single
    fused reduction* — the dot products against all previous columns and
    the squared norm of the candidate are produced by one masked GEMV so a
    distributed run pays exactly one psum per pass (the reference fuses
    the same quantities into one MPI_Allreduce, bvorthog.c:91-132).
  * The estimated post-projection norm uses the Pythagorean update
    norm'^2 = norm^2 - |c|^2, and a second pass (CGS2) refines — here the
    refinement is unconditional inside jitted hot loops (branch-free for
    XLA) or criterion-driven (eta = 1/sqrt(2)) at the Python API level,
    mirroring BV_ORTHOG_REFINE_{ALWAYS,IFNEEDED} semantics.
  * Block orthonormalization is CholeskyQR2 by default (two Gram+chol+trsm
    sweeps ≡ two psums, the communication shape of the reference's TSQR
    custom-reduction, bvlapack.c:347-560) plus SVQB and modified GS.

Masking convention: an (m,) 0/1 ``mask`` selects the "previous columns"
window; inactive columns must be zeroed by the mask, never assumed zero.
Indefinite inner products pass ``omega`` (±1 signature); B-inner products
pass the pre-applied ``Bw`` / Gram matrices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

ETA = 0.7071067811865476  # refinement criterion, ≙ bvorthog.c eta default


def project_coeffs(V, mask, Bw):
    """c = mask * (V^H Bw) — one fused reduction (single psum when sharded)."""
    c = V.conj().T @ Bw
    return c * mask


def cgs_pass(V, mask, w, Bw, omega: Optional[jnp.ndarray] = None):
    """One classical GS pass of w against masked columns of V.

    Returns (w_new, c, h) where h are the *inner-product space* coefficients
    used for projection (omega-weighted for indefinite metrics).
    """
    c = project_coeffs(V, mask, Bw)
    h = c if omega is None else c * omega
    w_new = w - V @ h
    return w_new, c, h


def orthogonalize_vec(
    V,
    mask,
    w,
    Bmult=None,
    omega: Optional[jnp.ndarray] = None,
    passes: int = 2,
):
    """Orthogonalize w against masked columns of V (CGS, `passes` sweeps).

    Branch-free (safe inside lax loops).  Returns
      (w, c_total, norm_before, norm_after)
    with norms in the B/omega metric; norm_after may be computed as a true
    norm (extra reduction) — we fuse it into the last pass's reduction by
    appending w to the GEMV, so each pass costs exactly one reduction.
    For indefinite metrics norm^2 can be negative; we return signed
    "norm" = sign(w^H B w) * sqrt|.| as the reference's pseudo-norms do
    (bvimpl.h BV_SafeSqrt).
    """
    Bw = w if Bmult is None else Bmult(w)
    # fused: [V w]^H Bw -> (c, w^H B w) in a single reduction
    c0 = V.conj().T @ Bw
    nsq = jnp.vdot(w, Bw)
    c0 = c0 * mask
    norm_before = _safe_sqrt(nsq)
    h = c0 if omega is None else c0 * omega
    w = w - V @ h
    c_total = c0
    for _ in range(passes - 1):
        Bw = w if Bmult is None else Bmult(w)
        c1 = (V.conj().T @ Bw) * mask
        h1 = c1 if omega is None else c1 * omega
        w = w - V @ h1
        c_total = c_total + c1
    Bw = w if Bmult is None else Bmult(w)
    norm_after = _safe_sqrt(jnp.vdot(w, Bw))
    return w, c_total, norm_before, norm_after


def _safe_sqrt(nsq):
    """Signed sqrt of a possibly-indefinite squared norm."""
    r = jnp.real(nsq)
    return jnp.sign(r) * jnp.sqrt(jnp.abs(r))


# ---------------------------------------------------------------------------
# block orthonormalization
# ---------------------------------------------------------------------------


def cholqr(X, Bmult=None, shift: float = 0.0):
    """One CholeskyQR sweep: X = Q R, returns (Q, R).

    Gram + Cholesky + triangular solve: a single reduction (psum of the
    Gram matrix) regardless of column count — the TPU-preferred replacement
    for column-by-column GS in block contexts.
    """
    BX = X if Bmult is None else Bmult(X)
    G = X.conj().T @ BX
    if shift:
        G = G + shift * jnp.eye(G.shape[0], dtype=G.dtype)
    R = jnp.linalg.cholesky(_herm(G)).conj().T  # upper
    Q = _tri_solve_right(X, R)
    return Q, R


def cholqr2(X, Bmult=None):
    """CholeskyQR2: two sweeps give CGS2-grade orthogonality.

    Falls back to a diagonal shift when the Gram matrix is numerically
    indefinite (rank-deficient input), like the reference's Cholesky block
    orthogonalization fallback chain (bvorthog.c:492-726).
    """
    eps = jnp.finfo(X.dtype).eps
    BX = X if Bmult is None else Bmult(X)
    G = _herm(X.conj().T @ BX)
    normG = jnp.linalg.norm(G)
    R1 = jnp.linalg.cholesky(G).conj().T
    bad = jnp.any(jnp.isnan(R1))
    # shifted retry (branch-free): G + 11(m n eps)||G|| I
    shift = 11.0 * (X.shape[0] * X.shape[1]) * eps * normG
    R1s = jnp.linalg.cholesky(G + shift * jnp.eye(G.shape[1], dtype=G.dtype)).conj().T
    R1 = jnp.where(bad, R1s, R1)
    Q = _tri_solve_right(X, R1)
    Q, R2 = cholqr(Q, Bmult)
    return Q, R2 @ R1


def svqb(X, Bmult=None, omega: Optional[jnp.ndarray] = None):
    """SVQB orthonormalization (Stathopoulos & Wu).

    Scales by the Gram diagonal, eigendecomposes, and forms
    Q = X D^-1/2 U Lambda^-1/2.  Handles the indefinite metric by
    returning the signature of the resulting basis.  Reference:
    BVOrthogonalize SVQB branch (bvorthog.c:583-641).
    """
    BX = X if Bmult is None else Bmult(X)
    G = _herm(X.conj().T @ BX)
    if omega is not None:
        G = G * omega[:, None]
    d = jnp.real(jnp.diagonal(G))
    ds = 1.0 / jnp.sqrt(jnp.abs(d) + jnp.finfo(X.dtype).eps)
    Gs = G * ds[:, None] * ds[None, :]
    lam, U = jnp.linalg.eigh(_herm(Gs))
    lam_s = 1.0 / jnp.sqrt(jnp.abs(lam) + jnp.finfo(X.dtype).eps)
    T = (ds[:, None] * U) * lam_s[None, :]
    return X @ T, T


def mgs_block(X, Bmult=None):
    """Modified Gram-Schmidt over the columns of X (sequential, stable).

    One reduction per column per pass — latency-bound when distributed;
    kept for robustness parity (BV_ORTHOG_TYPE_MGS, bvorthog.c:52).
    """
    m = X.shape[1]
    R = jnp.zeros((m, m), dtype=X.dtype)

    def col(j, state):
        X, R = state
        w = X[:, j]
        mask = (jnp.arange(m) < j).astype(X.real.dtype)
        w, c, _, nrm = orthogonalize_vec(X, mask, w, Bmult, passes=2)
        w = w / nrm
        R = R.at[:, j].set(c)
        R = R.at[j, j].set(nrm.astype(R.dtype))
        X = X.at[:, j].set(w)
        return X, R

    X, R = jax.lax.fori_loop(0, m, col, (X, R))
    return X, R


def tsqr(X, mesh=None):
    """Tall-skinny QR via per-shard QR + combine.

    The communication-optimal analog of the reference's TSQR with the
    packed-Givens MPI reduction (bvlapack.c:347-560).  Single device (or
    no mesh): one local QR.  On a row mesh: the true two-stage TSQR as a
    shard_map — local QR per shard, all-gather of the P small R factors
    (the ONLY communication: P*m*m elements), replicated QR of the
    stacked R, and a local (m x m) GEMM to assemble Q.
    """
    if mesh is None:
        from ..sys.mesh import get_mesh

        mesh = get_mesh()
    if mesh is None or X.shape[0] % mesh.devices.size != 0             or X.shape[0] // mesh.devices.size < X.shape[1]:
        Q, R = jnp.linalg.qr(X, mode="reduced")
        return Q, R
    return tsqr_shard_map(X, mesh)


def tsqr_shard_map(X, mesh):
    """Two-stage TSQR over the 'rows' mesh axis (see tsqr)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sys.mesh import ROWS

    m = X.shape[1]
    nper = mesh.shape[ROWS]

    def local(Xl):
        Ql, Rl = jnp.linalg.qr(Xl, mode="reduced")     # (nl, m), (m, m)
        Rall = jax.lax.all_gather(Rl, ROWS)            # (P, m, m)
        Q2, R = jnp.linalg.qr(Rall.reshape(nper * m, m), mode="reduced")
        i = jax.lax.axis_index(ROWS)
        Q2i = jax.lax.dynamic_slice_in_dim(Q2, i * m, m, axis=0)
        return Ql @ Q2i, R

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(ROWS, None),
                   out_specs=(P(ROWS, None), P(None, None)),
                   check_vma=False)
    Q, R = fn(X)
    return Q, R


def _herm(G):
    return 0.5 * (G + G.conj().T)


def _tri_solve_right(X, R):
    """Solve Q R = X for Q with R upper triangular: Q = X R^{-1}."""
    return jax.scipy.linalg.solve_triangular(R.T, X.T, lower=True).T
