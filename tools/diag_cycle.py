"""Component-level timing of the jitted KS cycles on the real TPU.

Methodology per CLAUDE.md: chained varying-input device-fused loops only.
The axon relay replays ANY constant-input repeat from cache — including
chains that converge to a fixed point (orthogonalize+normalize is
idempotent!), so every probe injects a per-call scalar perturbation that
keeps successive inputs distinct.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def timeit(f, x, iters, reps=5):
    """f(x, t) -> array like x; t is a per-call distinct scalar so no two
    dispatches ever see identical inputs (no relay replay)."""
    import jax
    import jax.numpy as jnp

    y = f(x, jnp.float32(1e-4))
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for k in range(2, reps + 2):
        y = f(y, jnp.float32(k * 1e-4))
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps / iters


def main():
    import jax
    import jax.numpy as jnp

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    x = op.pad2d(jnp.ones((n,), np.float32))
    ncv, b = 32, 8
    ITERS = 20

    rng = np.random.default_rng(0)

    # ---- 1. small eigh chains ----
    def mk_eigh_chain(m):
        @jax.jit
        def chain(S, t):
            def body(i, S):
                w, Q = jnp.linalg.eigh(S)
                S2 = (Q * (w + t)) @ Q.T
                return 0.5 * (S2 + S2.T)
            return jax.lax.fori_loop(0, ITERS, body, S)
        return chain

    M = rng.standard_normal((ncv, ncv)).astype(np.float32)
    log("timing eigh32 chain...")
    dt = timeit(mk_eigh_chain(ncv), jnp.asarray(M + M.T), ITERS)
    log(f"eigh 32x32: {dt*1e3:.3f} ms/call")

    M8 = rng.standard_normal((b, b)).astype(np.float32)
    log("timing eigh8 chain...")
    dt = timeit(mk_eigh_chain(b), jnp.asarray(M8 + M8.T), ITERS)
    log(f"eigh 8x8: {dt*1e3:.3f} ms/call")

    # ---- 2. cholesky 8x8 ----
    @jax.jit
    def chol_chain(S, t):
        def body(i, S):
            L = jnp.linalg.cholesky(S)
            S2 = L @ L.T
            return 0.5 * (S2 + S2.T) + t * jnp.eye(b, dtype=S.dtype)
        return jax.lax.fori_loop(0, ITERS, body, S)

    SPD = jnp.asarray(M8 @ M8.T + 8 * np.eye(b, dtype=np.float32))
    log("timing chol8 chain...")
    dt = timeit(chol_chain, SPD, ITERS)
    log(f"cholesky 8x8: {dt*1e3:.3f} ms/call")

    # ---- 3. BCGS GEMM pair over the full (33,...) basis, 8-block ----
    vshape = x.shape
    V = jnp.asarray(
        rng.standard_normal((ncv + 1,) + vshape).astype(np.float32))
    Wb0 = jnp.asarray(rng.standard_normal((b,) + vshape).astype(np.float32))

    @jax.jit
    def bcgs_chain(Wb, t):
        def body(i, Wb):
            C = jnp.einsum("k...,m...->km", V, Wb)
            Wb = Wb - jnp.einsum("km,k...->m...", C, V)
            # re-inject a span(V) component so the chain never fixes
            Wb = Wb / jnp.linalg.norm(Wb) + t * V[:b]
            return Wb
        return jax.lax.fori_loop(0, ITERS, body, Wb)

    log("timing bcgs gemm pair...")
    dt = timeit(bcgs_chain, Wb0, ITERS)
    gb = (2 * (ncv + 1) + 4 * b) * n * 4 / 1e9
    log(f"BCGS pair (33 rows + 8-block): {dt*1e3:.3f} ms ({gb/dt:.0f} GB/s)")

    # ---- 4. single-column CGS2 (4 GEMV sweeps) ----
    @jax.jit
    def cgs2_chain(v, t):
        def body(i, v):
            c = jnp.einsum("k...,...->k", V, v)
            v = v - jnp.einsum("k,k...->...", c, V)
            c2 = jnp.einsum("k...,...->k", V, v)
            v = v - jnp.einsum("k,k...->...", c2, V)
            return v / jnp.linalg.norm(v) + t * V[0]
        return jax.lax.fori_loop(0, ITERS, body, v)

    log("timing cgs2 column...")
    dt = timeit(cgs2_chain, x, ITERS)
    gb = (4 * (ncv + 1) + 5) * n * 4 / 1e9
    log(f"CGS2 column (4 sweeps over 33): {dt*1e3:.3f} ms ({gb/dt:.0f} GB/s)")

    # ---- 5. rotation GEMM: (32,32) applied to 32 basis rows ----
    Q0 = jnp.asarray(rng.standard_normal((ncv, ncv)).astype(np.float32))

    @jax.jit
    def rot_chain(V, t):
        def body(i, V):
            Vr = jnp.einsum("kp,k...->p...", Q0 + t, V[:ncv])
            return V.at[:ncv].set(Vr / jnp.linalg.norm(Vr))
        return jax.lax.fori_loop(0, ITERS, body, V)

    log("timing rotation...")
    dt = timeit(rot_chain, V, ITERS)
    gb = 2 * ncv * n * 4 / 1e9
    log(f"rotation V<-QV (32 rows): {dt*1e3:.3f} ms ({gb/dt:.0f} GB/s)")

    # ---- 6. 8 SpMVs ----
    @jax.jit
    def spmv8_chain(v, t):
        def body(i, v):
            for _ in range(8):
                v = op.mult2d(v)
            return v / jnp.linalg.norm(v) + t
        return jax.lax.fori_loop(0, ITERS, body, v)

    log("timing spmv x8...")
    dt = timeit(spmv8_chain, x, ITERS)
    log(f"8 chained SpMV: {dt*1e3:.3f} ms ({dt/8*1e3:.3f} ms each)")

    # ---- 7. full cycles for reference ----
    from slepc_tpu.eps.ks_jit import ks_hep_cycle, ks_hep_cycle_blocked

    key = jax.random.PRNGKey(0)
    v0n = x / jnp.linalg.norm(x)
    Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
    Hb = jnp.zeros((ncv + 1, ncv), np.float32)

    def chain_cycles(f, V, H, ncycles=4):
        o = f(V, H, jnp.asarray(0))
        jax.block_until_ready(o)
        st = (o[0], o[1], o[2])
        t0 = time.perf_counter()
        for _ in range(ncycles):
            o = f(st[0], st[1], st[2])
            st = (o[0], o[1], o[2])
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / ncycles

    log("timing full ks cycle...")
    dt = chain_cycles(lambda V, H, j: ks_hep_cycle(
        op, V, H, j, 1e-5, key, ncv=ncv, which="smallest"), Vb, Hb)
    log(f"ks_hep_cycle: {dt*1e3:.1f} ms/cycle")

    log("timing blocked ks cycle...")
    Vblk = jnp.zeros((ncv + b,) + vshape, np.float32)
    Mb = rng.standard_normal((int(np.prod(vshape)), b)).astype(np.float32)
    Qb, _ = np.linalg.qr(Mb)
    for i in range(b):
        Vblk = Vblk.at[i].set(jnp.asarray(Qb[:, i].reshape(vshape)))
    Hblk = jnp.zeros((ncv + b, ncv), np.float32)
    dt = chain_cycles(lambda V, H, j: ks_hep_cycle_blocked(
        op, V, H, j, 1e-5, key, ncv=ncv, b=b, which="smallest"), Vblk, Hblk)
    log(f"ks_hep_cycle_blocked: {dt*1e3:.1f} ms/cycle")

    log("done")


if __name__ == "__main__":
    main()
