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
