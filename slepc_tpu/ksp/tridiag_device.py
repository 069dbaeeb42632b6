"""Device-side symmetric tridiagonal LDL^T: factor, solve, inertia.

The reference's spectrum slicing reads matrix inertia off a sparse LDL^T
factorization computed per shift by a serial host solver
(src/eps/impls/krylov/krylovschur/ks-slice.c:227-258 via STMatSolve ->
KSPSolve with MUMPS/CHOLMOD, src/sys/classes/st/interface/stsles.c:35-59).
Through the axon relay the host tier caps slicing at ~1M rows (MB/s
uploads), so this module keeps the whole factor/solve/inertia pipeline ON
DEVICE for tridiagonal (Laplacian-class 1-D / Sturm) operators — the
reference makes the same scoping move by delegating the general case to
MUMPS.

TPU-native design — NO sequential loops; everything is a parallel prefix:

* The LDL^T pivot recurrence  d_i = a_i - b_{i-1}^2 / d_{i-1}  is a
  Moebius map, i.e. projective action of  M_i = [[a_i, -b_{i-1}^2],
  [1, 0]]:  d_i = (P_i)_{00} / (P_i)_{10} for the prefix product
  P_i = M_i ... M_1 acting on the initial direction [1, 0]^T.  Prefix
  products run in O(log n) depth via ``jax.lax.associative_scan``; each
  partial product is normalized by its max-|entry| (a POSITIVE scalar,
  so projective ratios and signs are exact).
* inertia(sigma) = #negative pivots of A - sigma*I
  = #(sign((P_i)_00) != sign((P_i)_10))  — the Sturm count.
* solve: the two triangular sweeps  y_i = b_i - l_{i-1} y_{i-1}  and
  x_i = z_i - l_i x_{i+1}  are first-order affine recurrences
  (y_i = alpha_i y_{i-1} + beta_i), composed associatively as
  (alpha, beta) pairs — two more O(log n) scans.

Caveat (documented, matches LAPACK stebz practice): the pivot recurrence
runs unpivoted; shifts pathologically close to an eigenvalue of a leading
minor lose accuracy — the slicing driver perturbs such shifts exactly as
the reference does on singular factorization (ks-slice.c:243-247).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _mobius_scan(a, c):
    """Prefix Moebius products for d_i = a_i - c_i / d_{i-1}.

    a: (n,) shifted diagonal; c: (n,) with c_0 = 0, c_i = b_{i-1}^2.
    Returns (p, q) with d_i = p_i / q_i (scale-normalized)."""
    n = a.shape[0]
    M = jnp.stack(
        [jnp.stack([a, -c], axis=-1),
         jnp.stack([jnp.ones((n,), a.dtype), jnp.zeros((n,), a.dtype)],
                   axis=-1)], axis=-2)  # (n, 2, 2)

    def comb(x, y):
        z = jnp.einsum("...ij,...jk->...ik", y, x)  # y AFTER x
        s = jnp.max(jnp.abs(z), axis=(-2, -1), keepdims=True)
        return z / jnp.maximum(s, jnp.finfo(z.dtype).tiny)

    P = jax.lax.associative_scan(comb, M, axis=0)
    # initial direction [1, 0]: d_i = P[i,0,0] / P[i,1,0]
    return P[:, 0, 0], P[:, 1, 0]


@jax.jit
def tridiag_pivots(a, b, sigma):
    """LDL^T pivots d of (T - sigma I), T = tridiag(b, a, b).

    a: (n,) diagonal; b: (n-1,) off-diagonal.  Returns (n,) pivots."""
    ash = a - sigma
    c = jnp.concatenate([jnp.zeros((1,), a.dtype), b * b])
    p, q = _mobius_scan(ash, c)
    tiny = jnp.finfo(a.dtype).tiny
    qs = jnp.where(jnp.abs(q) > tiny, q, tiny)
    return p / qs


@jax.jit
def tridiag_inertia(a, b, sigma):
    """#eigenvalues of T strictly below sigma (Sturm / Sylvester count).

    Sign-exact: uses only the SIGNS of the normalized prefix entries.
    A zero pivot (sigma hits an eigenvalue of a leading minor) counts as
    negative, the standard Sturm convention."""
    ash = a - sigma
    c = jnp.concatenate([jnp.zeros((1,), a.dtype), b * b])
    p, q = _mobius_scan(ash, c)
    sp = jnp.where(p > 0, 1, -1)
    sq = jnp.where(q > 0, 1, -1)
    return jnp.sum((sp != sq).astype(jnp.int32))


def _affine_scan(alpha, beta):
    """y_i = alpha_i * y_{i-1} + beta_i with y_0 = beta_0 (alpha_0
    ignored — set it to 0); all prefixes in O(log n) depth.  Backward
    recurrences flip their inputs and the result (the combine is
    non-commutative, so reverse= semantics are not relied on)."""
    def comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    a, b = jax.lax.associative_scan(comb, (alpha, beta), axis=0)
    return b


def _tridiag_mv(a, b, sigma, X):
    """(T - sigma I) @ X columns, X (n, k)."""
    ash = (a - sigma)[:, None]
    up = jnp.concatenate([b[:, None] * X[1:], jnp.zeros_like(X[:1])])
    dn = jnp.concatenate([jnp.zeros_like(X[:1]), b[:, None] * X[:-1]])
    return ash * X + up + dn


@partial(jax.jit, static_argnames=("refine",))
def tridiag_solve(a, b, sigma, rhs, refine: int = 1):
    """x = (T - sigma I)^{-1} rhs via the scanned LDL^T (three parallel
    prefix sweeps) + ``refine`` steps of iterative refinement (the
    prefix-product sweeps carry ~1e-10 relative roundoff vs the
    sequential substitution's 1e-14; one refinement step restores it).
    rhs may be (n,) or (n, k)."""
    d = tridiag_pivots(a, b, sigma)
    tiny = jnp.finfo(a.dtype).tiny
    dsafe = jnp.where(jnp.abs(d) > tiny, d, tiny)
    ell = b / dsafe[:-1]  # l_i couples row i -> i+1
    vec = rhs.ndim == 1
    R = rhs[:, None] if vec else rhs
    aF = jnp.concatenate([jnp.zeros((1,), a.dtype), -ell])[:, None]
    aB = jnp.concatenate([-ell, jnp.zeros((1,), a.dtype)])[:, None]

    def ldl_solve(Rb):
        y = _affine_scan(jnp.broadcast_to(aF, Rb.shape), Rb)
        z = y / dsafe[:, None]
        return jnp.flip(_affine_scan(
            jnp.flip(jnp.broadcast_to(aB, Rb.shape), axis=0),
            jnp.flip(z, axis=0)), axis=0)

    x = ldl_solve(R)
    for _ in range(refine):
        x = x + ldl_solve(R - _tridiag_mv(a, b, sigma, x))
    return x[:, 0] if vec else x


# ---------------------------------------------------------------------------
# BLOCK-tridiagonal symmetric LDL^T on device: banded operators (e.g. the
# 2-D Laplacian with bandwidth = side) viewed as block tridiagonal with
# b x b blocks.  The block pivot recurrence
#     D_i = A_i - B_{i-1}^T D_{i-1}^{-1} B_{i-1}
# runs as ONE lax.scan over the m blocks (each step: b x b solve on the
# MXU); inertia = sum of block inertias of the D_i (Sylvester congruence
# of the block LDL^T), read off vmapped b x b eigendecompositions.
# Solves are two more scans (block forward/backward substitution) + one
# iterative-refinement step.  Reference role: the banded/sparse LDL^T
# the slicing certificates delegate to MUMPS (stsles.c:35-59).
# ---------------------------------------------------------------------------


@jax.jit
def btridiag_pivots(Ab, Bb, sigma):
    """Block pivots D_i of (T - sigma I).

    Ab: (m, b, b) symmetric diagonal blocks; Bb: (m-1, b, b) with
    T[i+1, i] block = Bb[i] (sub-diagonal).  Returns (m, b, b)."""
    m, b, _ = Ab.shape
    eye = jnp.eye(b, dtype=Ab.dtype)
    Ash = Ab - sigma * eye[None]

    def step(Dprev, inputs):
        Ai, Bim1 = inputs
        X = jnp.linalg.solve(Dprev, Bim1.T)  # D_{i-1}^{-1} B_{i-1}^T
        Di = Ai - Bim1 @ X
        return Di, Di

    D1 = Ash[0]
    _, Drest = jax.lax.scan(step, D1, (Ash[1:], Bb))
    return jnp.concatenate([D1[None], Drest], axis=0)


@jax.jit
def btridiag_inertia(Ab, Bb, sigma):
    """#eigenvalues of T strictly below sigma via block Sturm count:
    sum over blocks of the negative eigenvalues of each D_i."""
    D = btridiag_pivots(Ab, Bb, sigma)
    D = 0.5 * (D + jnp.swapaxes(D, -1, -2))
    w = jnp.linalg.eigvalsh(D)  # (m, b)
    return jnp.sum((w < 0).astype(jnp.int32))


@partial(jax.jit, static_argnames=("refine",))
def btridiag_solve(Ab, Bb, sigma, rhs, refine: int = 1):
    """x = (T - sigma I)^{-1} rhs; rhs (n,) with n = m*b.

    Block LDL^T: forward substitution scan, block-diagonal solve,
    backward scan; one refinement step restores sequential-level
    accuracy."""
    m, b, _ = Ab.shape
    D = btridiag_pivots(Ab, Bb, sigma)
    # L sub-blocks: L_i = B_i D_i^{-1}  (i = 0..m-2)
    Lb = jnp.linalg.solve(jnp.swapaxes(D[:-1], -1, -2),
                          jnp.swapaxes(Bb, -1, -2))
    Lb = jnp.swapaxes(Lb, -1, -2)  # (m-1, b, b)
    eye = jnp.eye(b, dtype=Ab.dtype)

    def mv(X):
        """(T - sigma I) @ x for flat x."""
        Xb = X.reshape(m, b)
        y = jnp.einsum("ijk,ik->ij", Ab - sigma * eye[None], Xb)
        y = y.at[1:].add(jnp.einsum("ijk,ik->ij", Bb, Xb[:-1]))
        y = y.at[:-1].add(jnp.einsum("ikj,ik->ij",
                                     Bb, Xb[1:]))
        return y.reshape(-1)

    def ldl_solve(Rf):
        Rb = Rf.reshape(m, b)

        def fwd(yprev, inputs):
            ri, Li = inputs
            yi = ri - Li @ yprev
            return yi, yi

        y1 = Rb[0]
        _, yrest = jax.lax.scan(fwd, y1, (Rb[1:], Lb))
        y = jnp.concatenate([y1[None], yrest], axis=0)
        z = jnp.linalg.solve(D, y[..., None])[..., 0]

        def bwd(xnext, inputs):
            zi, Li = inputs
            xi = zi - Li.T @ xnext
            return xi, xi

        xm = z[-1]
        _, xrest = jax.lax.scan(bwd, xm, (z[:-1][::-1], Lb[::-1]))
        x = jnp.concatenate([xrest[::-1], xm[None]], axis=0)
        return x.reshape(-1)

    x = ldl_solve(rhs)
    for _ in range(refine):
        x = x + ldl_solve(rhs - mv(x))
    return x


def btridiag_of_operator(op, max_bw: int = 512):
    """Extract (Ablocks, Bblocks) when ``op`` is a symmetric banded
    DIAOperator with bandwidth <= max_bw and n divisible into b-blocks;
    None otherwise.  Block size b = bandwidth (the largest |offset|)."""
    from ..mat.linop import DIAOperator
    import scipy.sparse as sp

    if not isinstance(op, DIAOperator):
        return None
    offs = tuple(op.offsets)
    if not offs or set(offs) <= {-1, 0, 1}:
        return None  # plain tridiagonal handles this
    bw = max(abs(o) for o in offs)
    if bw > max_bw or bw < 2:
        return None
    n = op.shape[0]
    if n % bw != 0 or n // bw < 2:
        return None
    dd = np.asarray(op.diags)
    if np.issubdtype(dd.dtype, np.complexfloating):
        return None
    # DIAOperator convention: y[i] += diags[d][i] * x[i+offset] ->
    # A[i, i+o] = diags[d][i]; rebuild exactly:
    rows, cols, vals = [], [], []
    for i, o in enumerate(offs):
        idx = np.arange(max(0, -o), n - max(0, o))
        rows.append(idx)
        cols.append(idx + o)
        vals.append(dd[i][idx])
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    if abs(A - A.T).max() > 1e-12 * max(abs(A).max(), 1e-300):
        return None
    m = n // bw
    Ab = np.zeros((m, bw, bw))
    Bb = np.zeros((m - 1, bw, bw))
    Al = A.tolil()
    for i in range(m):
        Ab[i] = Al[i * bw:(i + 1) * bw, i * bw:(i + 1) * bw].toarray()
        if i + 1 < m:
            Bb[i] = Al[(i + 1) * bw:(i + 2) * bw,
                       i * bw:(i + 1) * bw].toarray()
    return Ab, Bb


class TridiagLDLDevice:
    """Factor-per-shift facade over the scanned kernels, mirroring the
    host DirectSolver surface that slicing consumes (ksp/direct.py):
    ``solve(rhs)``, ``inertia()``, plus ``shift(sigma)`` rebinding."""

    def __init__(self, a, b, sigma: float = 0.0):
        self.a = jnp.asarray(a)
        self.b = jnp.asarray(b)
        self.sigma = float(sigma)
        self.n = int(self.a.shape[0])

    def shift(self, sigma: float) -> "TridiagLDLDevice":
        return TridiagLDLDevice(self.a, self.b, sigma)

    def inertia(self):
        """(n_neg, n_zero, n_pos) of T - sigma I; n_zero is folded into
        n_neg by the Sturm zero convention (the slicing driver perturbs
        exactly-singular shifts anyway)."""
        neg = int(tridiag_inertia(self.a, self.b,
                                  jnp.asarray(self.sigma, self.a.dtype)))
        return neg, 0, self.n - neg

    def solve(self, rhs):
        return tridiag_solve(self.a, self.b,
                             jnp.asarray(self.sigma, self.a.dtype),
                             jnp.asarray(rhs, self.a.dtype))


def tridiag_of_operator(op):
    """Extract (a, b) when ``op`` is a symmetric tridiagonal DIAOperator;
    None otherwise (the device-slicing route test)."""
    from ..mat.linop import DIAOperator

    if not isinstance(op, DIAOperator):
        return None
    offs = tuple(op.offsets)
    dd = np.asarray(op.diags)
    try:
        i0 = offs.index(0)
    except ValueError:
        return None
    a = dd[i0]
    if offs == (0,):
        return a, np.zeros(len(a) - 1, dd.dtype)
    up = [o for o in offs if o == 1]
    dn = [o for o in offs if o == -1]
    if set(offs) - {-1, 0, 1} or not up:
        return None
    # DIAOperator convention: y[i] += diags[d][i] * x[i + offset]
    b_up = dd[offs.index(1)][: len(a) - 1]
    if dn:
        b_dn = dd[offs.index(-1)][1:]
        if not np.allclose(b_up, b_dn):
            return None  # not symmetric
    return a, b_up
