"""Isolate what the post-loop restart ops cost the KS extension loop.

diag_ext showed: extension alone = 7.4 ms/col, full cycle = 42 ms/col.
Hypothesis: the restart rotation einsum ("kp,k...->p...") forces a bad
XLA layout on the loop-carried basis V, slowing every GEMV inside the
loop.  Probes (all chained varying-input):
  E. extension loop (carrying V,H) + eigh + rotation einsum (3-D view)
  F. E with optimization_barrier between loop and restart ops
  G. E with the rotation done on a RESHAPED 2-D flat view
  H. extension loop + eigh only (no rotation)
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
    ncols = 16
    rng = np.random.default_rng(0)
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    V0 = jnp.asarray(
        rng.standard_normal((ncv + 1,) + vshape).astype(np.float32))
    rdtype = jnp.float32

    def cgs2(V, w, mask):
        c = jnp.einsum("k...,...->k", V, w) * mask
        w = w - jnp.einsum("k,k...->...", c, V)
        c2 = jnp.einsum("k...,...->k", V, w) * mask
        w = w - jnp.einsum("k,k...->...", c2, V)
        return w, c + c2

    def ext_loop(V, t):
        H = jnp.zeros((ncv + 1, ncv), jnp.float32)
        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

        def body(j, VH):
            V, H = VH
            w = op.mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))
            col = jnp.zeros((ncv + 1,), jnp.float32).at[:ncv].set(c[:ncv])
            col = jax.lax.dynamic_update_index_in_dim(col, beta, j + 1, 0)
            H = H.at[:, j].set(col)
            return V, H

        return jax.lax.fori_loop(j0, ncv, body, (V, H))

    def restart3d(V, H):
        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.T)
        theta, Q = jnp.linalg.eigh(S)
        Vrot = jnp.einsum("kp,k...->p...", Q, V[:ncv])
        return V.at[:ncv].set(Vrot), theta

    @jax.jit
    def probeE(V, t):
        V, H = ext_loop(V, t)
        V, theta = restart3d(V, H)
        return V / jnp.maximum(jnp.linalg.norm(V), 1.0)

    log("timing E: loop + eigh + 3-D rotation...")
    dt = timeit(probeE, V0)
    log(f"E loop+restart3d: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col-eq)")

    @jax.jit
    def probeF(V, t):
        V, H = ext_loop(V, t)
        V, H = jax.lax.optimization_barrier((V, H))
        V, theta = restart3d(V, H)
        return V / jnp.maximum(jnp.linalg.norm(V), 1.0)

    log("timing F: + optimization_barrier...")
    dt = timeit(probeF, V0)
    log(f"F barrier: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col-eq)")

    @jax.jit
    def probeG(V, t):
        V, H = ext_loop(V, t)
        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.T)
        theta, Q = jnp.linalg.eigh(S)
        Vf = V.reshape(ncv + 1, -1)
        Vrot = (Q.T @ Vf[:ncv]).reshape((ncv,) + V.shape[1:])
        V = V.at[:ncv].set(Vrot)
        return V / jnp.maximum(jnp.linalg.norm(V), 1.0)

    log("timing G: + 2-D reshaped rotation...")
    dt = timeit(probeG, V0)
    log(f"G flat-rot: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col-eq)")

    @jax.jit
    def probeH(V, t):
        V, H = ext_loop(V, t)
        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.T)
        theta, Q = jnp.linalg.eigh(S)
        # fold theta back without a basis rotation
        return V * (1.0 + 1e-9 * theta[0])

    log("timing H: loop + eigh only...")
    dt = timeit(probeH, V0)
    log(f"H eigh-only: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col-eq)")

    log("done")


if __name__ == "__main__":
    main()
