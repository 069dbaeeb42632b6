"""Jit-safe fixed-iteration Krylov linear solvers (device inner-solve tier).

Role in the reference: ST's inner solves ride PETSc KSP — typically a
distributed direct factorization (MUMPS/SuperLU) reached through
``STMatSolve -> KSPSolve`` (src/sys/classes/st/interface/stsles.c:198-216).
On TPU a host factorization at 10M rows is unusable (the relay uploads at
~MB/s), so the device tier solves iteratively: CG for definite systems,
MINRES for symmetric-indefinite ones — each a ``lax.fori_loop`` with a
STATIC iteration count so the whole solve fuses into the caller's XLA
program (e.g. one Krylov-Schur restart cycle = extension + inner solves +
projected eig in a single program).

Branch-free early exit: once the residual passes the floor the updates are
masked to zero (alpha = 0), so extra iterations are numerically harmless —
the static count is an upper bound, not an exact schedule.  All reductions
are multiply+reduce (never dot_general) so f64 stays fusable on TPU
(emulated f64 dot_general materializes 8-way split-product temporaries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a.conj() * b)


def cg_fixed(mult, b, iters: int, Minv=None, x0=None, rtol=1e-14):
    """Conjugate gradients on an SPD operator, fixed ``iters`` steps.

    mult: v -> A v (same array layout as b; padded 2-D welcome).
    Minv: optional preconditioner application (SPD).
    Returns the approximate solution x with ||b - A x|| <= ~rtol ||b||
    once the static budget allows (masked updates after convergence).
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mult(x) if x0 is not None else b
    z = Minv(r) if Minv is not None else r
    p = z
    rz = _dot(r, z)
    stop2 = (rtol * jnp.linalg.norm(b)) ** 2

    def body(_, st):
        x, r, p, rz = st
        Ap = mult(p)
        pAp = _dot(p, Ap).real
        live = (_dot(r, r).real > stop2) & (pAp > 0)
        alpha = jnp.where(live, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r) if Minv is not None else r
        rz2 = _dot(r, z)
        beta = jnp.where(live, rz2 / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        rz = jnp.where(live, rz2, rz)
        return x, r, p, rz

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def minres_fixed(mult, b, iters: int, x0=None, rtol=1e-14):
    """MINRES on a symmetric (possibly indefinite) operator, fixed steps.

    Standard Paige-Saunders recurrence (Lanczos + Givens on the
    tridiagonal), branch-free; covers interior-shift (A - sigma B)
    solves where CG breaks down.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mult(x) if x0 is not None else b
    beta0 = jnp.linalg.norm(r)
    bsafe = jnp.where(beta0 > 0, beta0, 1.0)
    v = r / bsafe
    v_old = jnp.zeros_like(b)
    w = jnp.zeros_like(b)
    w_old = jnp.zeros_like(b)
    eta = beta0
    c, c_old = jnp.ones(()), jnp.ones(())
    s, s_old = jnp.zeros(()), jnp.zeros(())
    beta = beta0
    stop = rtol * beta0

    def body(_, st):
        (x, v, v_old, w, w_old, eta, c, c_old, s, s_old, beta) = st
        live = jnp.abs(eta) > stop
        Av = mult(v)
        alpha = _dot(v, Av).real
        r_new = Av - alpha * v - beta * v_old
        beta_new = jnp.linalg.norm(r_new)
        # two previous rotations
        delta = c * alpha - c_old * s * beta
        gamma2 = s * alpha + c_old * c * beta
        epsilon = s_old * beta
        # new rotation annihilating beta_new
        gamma1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        gsafe = jnp.where(gamma1 > 0, gamma1, 1.0)
        c_new = delta / gsafe
        s_new = beta_new / gsafe
        w_new = (v - gamma2 * w - epsilon * w_old) / gsafe
        step = jnp.where(live, c_new * eta, 0.0)
        x = x + step * w_new
        eta = jnp.where(live, -s_new * eta, eta)
        bn = jnp.where(beta_new > 0, beta_new, 1.0)
        v_new = r_new / bn
        return (x, v_new, v, w_new, w, eta, c_new, c, s_new, s, beta_new)

    st = (x, v, v_old, w, w_old, eta, c, c_old, s, s_old, beta)
    st = jax.lax.fori_loop(0, iters, body, st)
    return st[0]
