"""Round-5 diagnosis: where does the filtered cycle's per-column cost go?

2.1M-row mid-scale TPU run measured 124 ms/col against a 58 ms filtered
apply (partial reorth) — overhead 112%, dominated by something FIXED per
cycle (~1.6 s over ~24 columns).  Suspects: the on-device f64-emulated
projected eigh (48x48), the chunked f64 restart rotation, the omega
recurrence bookkeeping.  This measures each in isolation on TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit_chain(f, x, reps=3):
    import jax

    y = f(x, 1)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for k in range(reps):
        y = f(y, k + 2)
        jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from slepc_tpu.eps.ks_jit import _hep_cycle_impl, _rotate_basis
    from slepc_tpu.mat.generators import laplacian_3d_device
    from slepc_tpu.ops.jacobi_eigh import eigh_small
    from slepc_tpu.st.cheb import ChebAmplifyOperator

    ncv = 48
    op = laplacian_3d_device(126, 128, 130, dtype=np.float64)
    key = jax.random.PRNGKey(0)
    vshape = op.mask2d.shape

    # ---- 1. eigh_small(48x48 f64) standalone ----
    @jax.jit
    def eig_chain(S, t):
        S = S + t * 1e-9
        def body(i, S):
            w, Q = eigh_small(0.5 * (S + S.T))
            return S + 1e-12 * (Q * w[None, :]) @ Q.T
        return jax.lax.fori_loop(0, 10, body, S)

    S0 = jnp.asarray(np.random.default_rng(0).standard_normal((ncv, ncv)))
    S0 = 0.5 * (S0 + S0.T)
    log("compiling eigh chain (f64)...")
    dt = timeit_chain(lambda S, t: eig_chain(S, jnp.float64(t)), S0)
    log(f"eigh_small {ncv}x{ncv} f64: {dt/10*1e3:.1f} ms per call")

    # ---- 2. rotation at (ncv+1, vshape) f64 ----
    V = jax.random.normal(key, (ncv + 1,) + vshape, jnp.float64) \
        * op.mask2d[None]
    Q0 = jnp.asarray(np.linalg.qr(np.random.default_rng(1)
                                  .standard_normal((ncv, ncv)))[0])

    @jax.jit
    def rot_chain(V, t):
        Vr = _rotate_basis(Q0 * (1.0 + t * 1e-9), V, ncv)
        return V.at[:ncv].set(Vr)

    log("compiling rotation...")
    dt = timeit_chain(lambda V, t: rot_chain(V, jnp.float64(t)), V)
    log(f"_rotate_basis ncv={ncv} f64 @2.1M: {dt*1e3:.1f} ms per cycle")

    # ---- 3. full cycle at degree 200 vs degree 2 (partial + full) ----
    H0 = jnp.zeros((ncv + 1, ncv), jnp.float64)
    for reorth in ("partial", "full"):
        for deg in (200, 2):
            bop = ChebAmplifyOperator(op, 0.017, 12.0, deg)
            Vc = V / jnp.linalg.norm(V[0])

            def cyc(V, t):
                o = _hep_cycle_impl(bop, V, H0, jnp.asarray(np.int32(0)),
                                    1e-30, key, jnp.asarray(0), ncv=ncv,
                                    which="largest", passes=2,
                                    reorth_period=1, reorth=reorth,
                                    nsel=0, orth="xla")
                return o[0]

            log(f"compiling cycle reorth={reorth} deg={deg}...")
            dt = timeit_chain(lambda V, t: cyc(V, t), Vc, reps=2)
            log(f"cycle reorth={reorth} deg={deg}: {dt:.2f} s "
                f"({dt/ncv*1e3:.0f} ms/col)")


if __name__ == "__main__":
    main()
