"""Small dense symmetric eigensolver for INSIDE jitted TPU cycles.

XLA's jnp.linalg.eigh lowers to an iterative QR/spectral bisection
custom-call that costs tens of milliseconds even for 32x32 operands on
TPU — catastrophic inside a Krylov restart cycle that calls it every
iteration (the projected solve, SVQB Gram factorizations, LOBPCG
Rayleigh-Ritz).  The projected matrices are tiny (ncv <= 128), so the
right tool is a fixed-sweep CYCLIC JACOBI: per round-robin round the
n/2 disjoint rotations compose into ONE orthogonal matrix J built with
static scatter indices, and the update is two small MXU matmuls
(A <- J^T A J, V <- V J).  Everything is unrolled, branch-free, and
static — exactly what the TPU compiler wants; quadratic convergence
makes 8-12 sweeps machine-precision for n <= 64.

This plays the role LAPACK steqr/syevd plays for the reference's DS tier
(src/sys/classes/ds/impls/hep/dshep.c) for the ON-DEVICE fast paths; the
host DS tier keeps scipy/LAPACK.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _round_robin_schedule(n: int):
    """n-1 rounds of n/2 disjoint index pairs (circle method); n even."""
    idx = list(range(n))
    rounds = []
    for _ in range(n - 1):
        ps, qs = [], []
        for i in range(n // 2):
            a, b = idx[i], idx[n - 1 - i]
            ps.append(min(a, b))
            qs.append(max(a, b))
        rounds.append((np.asarray(ps), np.asarray(qs)))
        idx = [idx[0], idx[-1]] + idx[1:-1]
    return tuple(rounds)


def jacobi_eigh(S, sweeps: int | None = None):
    """Eigendecomposition of a small real symmetric matrix, ascending.

    Drop-in for jnp.linalg.eigh on REAL operands with n <= ~128; complex
    operands fall back to jnp.linalg.eigh.  Deterministic fixed sweep
    count (default 12 — quadratic convergence puts 32x32 at machine
    precision well before that).
    """
    n = S.shape[-1]
    if np.issubdtype(np.dtype(S.dtype), np.complexfloating):
        return jnp.linalg.eigh(S)
    if n == 1:
        return jnp.real(S[..., 0, 0])[None], jnp.ones_like(S)
    npad = n + (n % 2)
    if npad != n:  # odd: pad with a decoupled huge diagonal entry
        big = jnp.asarray(1.0, S.dtype) / jnp.finfo(S.dtype).tiny ** 0.5
        Sp = jnp.zeros((npad, npad), S.dtype)
        Sp = Sp.at[:n, :n].set(S).at[n, n].set(big)
        w, V = jacobi_eigh(Sp, sweeps)
        return w[:n], V[:n, :n]
    if sweeps is None:
        sweeps = 12 if n <= 64 else 16
    sched = _round_robin_schedule(n)
    eye = jnp.eye(n, dtype=S.dtype)
    tiny = jnp.finfo(S.dtype).tiny

    def one_sweep(_, AV):
        A, V = AV
        for ps, qs in sched:
            p = jnp.asarray(ps)
            q = jnp.asarray(qs)
            app = A[p, p]
            aqq = A[q, q]
            apq = A[p, q]
            denom = 2.0 * apq
            small = jnp.abs(apq) <= tiny ** 0.5 * jnp.sqrt(
                jnp.abs(app * aqq) + tiny)
            tau = (aqq - app) / jnp.where(small, 1.0, denom)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(small, 0.0, t)
            c = jax.lax.rsqrt(1.0 + t * t)
            s = t * c
            J = eye.at[p, p].set(c).at[q, q].set(c) \
                   .at[p, q].set(s).at[q, p].set(-s)
            A = J.T @ A @ J
            V = V @ J
        return A, V

    A, V = jax.lax.fori_loop(0, sweeps, one_sweep, (S, eye))
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def use_jacobi(dtype, n: int) -> bool:
    """Routing gate for eigh_small.  DISABLED: on-device measurement
    shows XLA's eigh at 32x32 costs ~1.4 ms inside a fused cycle (not a
    bottleneck), and the Mosaic lowering of this kernel's vector-index
    scatter produces wrong rotations on the current TPU toolchain
    (correct on CPU: 3e-14).  Kept for when either fact changes."""
    return False


def eigh_small(S):
    """jnp.linalg.eigh or jacobi_eigh, picked per backend/dtype/size."""
    if use_jacobi(S.dtype, S.shape[-1]):
        return jacobi_eigh(S)
    return jnp.linalg.eigh(S)
