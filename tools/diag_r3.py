"""Round-3 on-TPU A/B: j0-handoff pattern + pallas orth + blocked cycle.

KEY ROUND-3 FINDING (tools/diag_tail.py, CPU + TPU): chaining the restart
cycle's returned DEVICE scalar kl back in as the next call's j0 makes the
IDENTICAL executable ~3x slower than passing a fresh host int32 of the
same value (no recompiles; mechanism in the runtime, not the program).
Every section here times both handoffs.

Sections (independent, logged as they land; all chained varying inputs):
  1. SpMV ms/iter (fused 50-iter chain) — window reference
  2. library cycle, xla orth     — dev-chained vs host-synced j0
  3. library cycle, pallas orth  — host-synced j0
  4. partial/omega reorth        — host-synced j0
  5. BLOCKED cycle b=8, pallas   — host-synced jb0
  6. micro: einsum vs pallas dots/update sweeps (V as traced arg)
All at 8.4M rows (2896^2 5-point Laplacian), ncv=32, f32.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    import jax

    if os.environ.get("DIAG_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    side = int(os.environ.get("DIAG_SIDE", "2896"))
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    ncv = 32
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    key = jax.random.PRNGKey(0)
    v0 = x0 / jnp.linalg.norm(x0)
    cols = ncv // 2
    results = {}

    ITERS = 50

    @jax.jit
    def spmv_loop(x):
        def body(i, v):
            y = op.mult2d(v)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, ITERS, body, x)

    log("compiling spmv loop...")
    y = spmv_loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(3):
        y = spmv_loop(y)
    jax.block_until_ready(y)
    dt_spmv = (time.perf_counter() - t0) / 3 / ITERS
    results["spmv_ms"] = dt_spmv * 1e3
    log(f"1. spmv: {dt_spmv*1e3:.3f} ms/iter "
        f"({A.nnz/dt_spmv/1e9:.1f} Gnnz/s)")

    def fresh_VH(extra=1):
        V = jnp.zeros((ncv + extra,) + vshape, np.float32).at[0].set(v0)
        H = jnp.zeros((ncv + extra, ncv), np.float32)
        return V, H

    def chain(f, V, H, j0_mode, ncycles=4):
        o = f(V, H, jnp.asarray(np.int32(0)))
        jax.block_until_ready(o)
        st = (o[0], o[1], o[2])
        t0 = time.perf_counter()
        for _ in range(ncycles):
            j0 = st[2] if j0_mode == "dev" else jnp.asarray(
                np.int32(int(st[2])))
            o = f(st[0], st[1], j0)
            st = (o[0], o[1], o[2])
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / ncycles

    from slepc_tpu.eps.ks_jit import (get_ks_hep_cycle,
                                      get_ks_hep_cycle_blocked)

    for name, kw, modes in (
            ("xla", dict(orth="xla"), ("dev", "host")),
            ("pallas", dict(orth="pallas"), ("host",)),
            ("partial_xla", dict(orth="xla", reorth="partial"), ("host",)),
            ("partial_pallas", dict(orth="pallas", reorth="partial"),
             ("host",))):
        fn = get_ks_hep_cycle(op, key, ncv, "smallest", **kw)
        for mode in modes:
            try:
                V, H = fresh_VH()
                log(f"compiling/timing {name} [{mode} j0]...")
                dt = chain(lambda V, H, j: fn(V, H, j, 1e-5, 0), V, H, mode)
                results[f"{name}_{mode}_ms_col"] = dt / cols * 1e3
                log(f"{name} [{mode}]: {dt*1e3:.1f} ms/cycle "
                    f"({dt/cols*1e3:.2f} ms/col)")
                del V, H
            except Exception as e:
                log(f"{name} [{mode}] failed: {e!r}")

    # ---- blocked ----
    try:
        b = 8
        fnb = get_ks_hep_cycle_blocked(op, key, ncv, b, "smallest",
                                       orth="pallas")
        rngb = np.random.default_rng(1)
        Vb = jnp.zeros((ncv + b,) + vshape, np.float32)
        M = rngb.standard_normal((int(np.prod(vshape)), b)).astype(np.float32)
        M[:, 0] = np.asarray(v0).ravel()
        Qb, _ = np.linalg.qr(M)
        for i in range(b):
            Vb = Vb.at[i].set(jnp.asarray(Qb[:, i].reshape(vshape)))
        Vb = Vb * op.mask2d[None]
        Hb = jnp.zeros((ncv + b, ncv), np.float32)
        log("compiling blocked pallas cycle...")
        dt = chain(lambda V, H, j: fnb(V, H, j, 1e-5), Vb, Hb, "host")
        results["blocked_pallas_ms_col"] = dt / cols * 1e3
        log(f"blocked b=8 pallas [host]: {dt*1e3:.1f} ms/cycle "
            f"({dt/cols*1e3:.2f} ms/col)")
        del Vb, Hb
    except Exception as e:
        log(f"blocked failed: {e!r}")

    # ---- micro kernels (V as traced arg; 16 chained iterations/jit) ----
    from slepc_tpu.ops import bv_pallas as bvp

    Vfull = jax.random.normal(jax.random.PRNGKey(7),
                              (ncv + 1,) + vshape, jnp.float32)
    MICRO = 16

    def micro(f, label):
        @jax.jit
        def loop(V, x):
            def body(i, w):
                y = f(V, w)
                return y / jnp.linalg.norm(y)
            return jax.lax.fori_loop(0, MICRO, body, x)
        try:
            log(f"compiling micro {label}...")
            y = loop(Vfull, x0)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(3):
                y = loop(Vfull, y)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / 3 / MICRO
            results[f"micro_{label}_ms"] = dt * 1e3
            log(f"micro {label}: {dt*1e3:.3f} ms/op")
        except Exception as e:
            log(f"micro {label} failed: {e!r}")

    micro(lambda V, w: w - 1e-6 * jnp.einsum(
        "k,k...->...", jnp.einsum("k...,...->k", V, w), V),
        "einsum_dots_update")
    micro(lambda V, w: w - 1e-6 * bvp.panel_update(
        V, bvp.panel_dots(V, w[None]), w[None])[0],
        "pallas_dots_update")
    micro(lambda V, w: bvp.panel_update_dots(
        V, jnp.zeros((ncv + 1, 1), jnp.float32), w[None])[0][0],
        "pallas_update_dots")

    log("RESULTS " + " ".join(f"{k}={v:.3f}" for k, v in results.items()))
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
