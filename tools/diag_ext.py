"""A/B the KS extension loop's structural choices on the real TPU.

ks_hep_cycle measures ~60 ms/column while raw CGS2+SpMV components are
~15 ms/column — this isolates which structure eats the difference:
  A. plain CGS2 extension (no cond, static python loop over columns)
  B. + fori_loop with traced start (dynamic trip count)
  C. + breakdown-restart lax.cond per column
  D. full ks_hep_cycle for reference
Chained varying-input timing throughout (perturbation t per call).
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

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    ncv = 32
    ncols = 16  # steady-state extension size
    rng = np.random.default_rng(0)
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    V0 = jnp.asarray(
        rng.standard_normal((ncv + 1,) + vshape).astype(np.float32))
    rdtype = jnp.float32
    eps_mach = jnp.finfo(np.float32).eps

    def cgs2(V, w, mask):
        c = jnp.einsum("k...,...->k", V, w) * mask
        w = w - jnp.einsum("k,k...->...", c, V)
        c2 = jnp.einsum("k...,...->k", V, w) * mask
        w = w - jnp.einsum("k,k...->...", c2, V)
        return w, c + c2

    # ---- A. static python-unrolled extension, no cond ----
    @jax.jit
    def ext_static(V, t):
        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        for j in range(ncols, ncv):
            w = op.mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))
        return V

    log("timing A: static unroll, no cond...")
    dt = timeit(ext_static, V0)
    log(f"A ext_static: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    # ---- B. fori_loop with TRACED start ----
    @jax.jit
    def ext_fori(V, t):
        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

        def body(j, V):
            w = op.mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            return V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))

        return jax.lax.fori_loop(j0, ncv, body, V)

    log("timing B: fori traced start, no cond...")
    dt = timeit(ext_fori, V0)
    log(f"B ext_fori: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    # ---- C. fori_loop + breakdown cond (mirrors ks_hep_cycle body) ----
    key = jax.random.PRNGKey(0)

    @jax.jit
    def ext_cond(V, t):
        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

        def body(j, V):
            w = op.mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            is_brk = beta < eps_mach ** 0.75 * (jnp.linalg.norm(c) + eps_mach)

            def mk_restart(_):
                rnd = jax.random.normal(jax.random.fold_in(key, j), vshape,
                                        rdtype)
                rnd, _ = cgs2(V, rnd, mask)
                return rnd, jnp.linalg.norm(rnd)

            w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                       lambda _: (w, beta), None)
            return V.at[j + 1].set(
                w / jnp.where(beta_eff > 0, beta_eff, 1.0))

        return jax.lax.fori_loop(j0, ncv, body, V)

    log("timing C: fori + breakdown cond...")
    dt = timeit(ext_cond, V0)
    log(f"C ext_cond: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    # ---- D. full cycle reference ----
    from slepc_tpu.eps.ks_jit import ks_hep_cycle

    v0n = x0 / jnp.linalg.norm(x0)
    Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
    Hb = jnp.zeros((ncv + 1, ncv), np.float32)
    o = ks_hep_cycle(op, Vb, Hb, jnp.asarray(0), 1e-5, key, ncv=ncv,
                     which="smallest")
    jax.block_until_ready(o)
    st = (o[0], o[1], o[2])
    t0 = time.perf_counter()
    for _ in range(4):
        o = ks_hep_cycle(op, st[0], st[1], st[2], 1e-5, key, ncv=ncv,
                         which="smallest")
        st = (o[0], o[1], o[2])
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 4
    log(f"D ks_hep_cycle: {dt*1e3:.1f} ms/cycle ({dt/ncols*1e3:.2f} ms/col)")

    log("done")


if __name__ == "__main__":
    main()
