"""A/B: operator closure-captured vs passed as a traced jit argument.

Suspicion from diag_bisect: identical extension loops measure ~150 ms
(op captured) vs ~570 ms (op as argument).  This probe isolates that one
variable, plus a variant where only dp is captured but V flows as arg.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def timeit(f, *args, reps=4):
    import jax
    import jax.numpy as jnp

    head, x = args[:-1], args[-1]
    y = f(*head, x, jnp.float32(1e-4))
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for k in range(2, reps + 2):
        y = f(*head, y, jnp.float32(k * 1e-4))
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op0 = DIAPaddedOperator.from_dia(A)
    ncv = 32
    ncols = 16
    rng = np.random.default_rng(0)
    x0 = op0.pad2d(jnp.ones((n,), np.float32))
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

    def ext(op, V, t):
        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

        def body(j, V):
            w = op.mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            return V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))

        return jax.lax.fori_loop(j0, ncv, body, V)

    @jax.jit
    def closure_ext(V, t):
        return ext(op0, V, t)

    log("A: op closure-captured...")
    dt = timeit(closure_ext, V0)
    log(f"A closure: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    @jax.jit
    def arg_ext(op, V, t):
        return ext(op, V, t)

    log("B: op as traced pytree argument...")
    dt = timeit(arg_ext, op0, V0)
    log(f"B op-arg: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    # C: dp donated? no — dp as plain array arg, offsets static
    from slepc_tpu.ops.dia_pallas import dia_spmv_padded_v3

    @partial(jax.jit, static_argnames=("offsets",))
    def arr_ext(dp, offsets, V, t):
        class _O:  # minimal shim: only dp varies as an argument
            pass

        def mult2d(x):
            return dia_spmv_padded_v3(offsets, dp, x, n, 128)

        V = V.at[ncols].set(V[ncols] / jnp.linalg.norm(V[ncols]) + t)
        j0 = jnp.asarray(ncols) + (t * 0).astype(jnp.int32)

        def body(j, V):
            w = mult2d(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            w, c = cgs2(V, w, mask)
            beta = jnp.linalg.norm(w)
            return V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))

        return jax.lax.fori_loop(j0, ncv, body, V)

    log("C: dp array as argument (offsets static)...")
    dt = timeit(lambda dp, V, t: arr_ext(dp, tuple(op0.offsets), V, t),
                op0.dp, V0)
    log(f"C dp-arg: {dt*1e3:.1f} ms ({dt/ncols*1e3:.2f} ms/col)")

    log("done")


if __name__ == "__main__":
    main()
