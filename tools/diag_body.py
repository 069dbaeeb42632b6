"""Final body-level bisection of ks_hep_cycle's extension loop.

Known fast (7.2-9.5 ms/col): cgs2+Vset; +H bookkeeping; +breakdown cond
without H.  The real body has BOTH cond and H (and the H column couples
to the cond predicate).  Probes:
  D. full real body (cond + H, col depends on is_brk)    <- suspect
  E. D but col's beta entry independent of is_brk
  F. D but mk_restart without the opmask multiply
  G. D + post-loop eigh (stage-2 equivalent; expect ~570 if D slow)
Chained with per-call perturbation (no fixed points, no replay).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def timeit(f, x, reps=4):
    import jax
    import jax.numpy as jnp

    y = f(x, jnp.float32(1e-4))
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for k in range(2, reps + 2):
        y = f(y, jnp.float32(k * 1e-4))
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator
    from slepc_tpu.ops.jacobi_eigh import eigh_small

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    ncv = 32
    ncols = 16
    rng = np.random.default_rng(0)
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    V0 = jnp.asarray(
        rng.standard_normal((ncv + 1,) + vshape).astype(np.float32))
    rdtype = jnp.float32
    eps_mach = jnp.finfo(np.float32).eps
    key = jax.random.PRNGKey(0)
    opmask = op.mask2d

    def vdots(V, w):
        return jnp.einsum("k...,...->k", V.conj(), w)

    def vcomb(c, V):
        return jnp.einsum("k,k...->...", c, V)

    def mk_loop(col_brk_dep: bool, use_mask: bool, post_eigh: bool):
        @jax.jit
        def run(V, t):
            H = jnp.zeros((ncv + 1, ncv), jnp.float32)
            V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
            j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

            def body(j, state):
                V, H = state
                v = V[j]
                w = op.mult2d(v)
                mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)

                def full_orth(w):
                    c = vdots(V, w) * mask
                    w = w - vcomb(c, V)
                    c2 = vdots(V, w) * mask
                    w = w - vcomb(c2, V)
                    return w, c + c2

                w, c_tot = full_orth(w)
                beta = jnp.linalg.norm(w)
                is_brk = beta < eps_mach ** 0.75 * (jnp.linalg.norm(c_tot)
                                                    + eps_mach)

                def mk_restart(_):
                    rnd = jax.random.normal(jax.random.fold_in(key, j),
                                            vshape, rdtype)
                    if use_mask:
                        rnd = rnd * opmask
                    rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                    rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                    return rnd, jnp.linalg.norm(rnd)

                w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                           lambda _: (w, beta), None)
                safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
                V = V.at[j + 1].set(w / safe)
                col = jnp.zeros((ncv + 1,), jnp.float32).at[:ncv].set(
                    c_tot[:ncv])
                bent = jnp.where(is_brk, 0.0, beta) if col_brk_dep else beta
                col = jax.lax.dynamic_update_index_in_dim(
                    col, bent, j + 1, 0)
                H = H.at[:, j].set(col)
                return V, H

            V, H = jax.lax.fori_loop(j0, ncv, body, (V, H))
            if post_eigh:
                S = H[:ncv, :ncv]
                theta, Q = eigh_small(0.5 * (S + S.T))
                return V * (1.0 + 0.0 * theta[0]), H
            return V, H

        return lambda V, t: run(V, t)[0]

    log("D: full real body (cond + H-coupled)...")
    dt = timeit(mk_loop(True, True, False), V0)
    log(f"D: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    log("E: col beta independent of is_brk...")
    dt = timeit(mk_loop(False, True, False), V0)
    log(f"E: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    log("F: mk_restart without opmask...")
    dt = timeit(mk_loop(True, False, False), V0)
    log(f"F: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    log("G: D + post eigh...")
    dt = timeit(mk_loop(True, True, True), V0)
    log(f"G: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    log("done")


if __name__ == "__main__":
    main()
