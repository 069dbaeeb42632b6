"""Benchmark: SpMV throughput + filtered Krylov eigensolve on the real chip.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": N, "unit": "nnz/s", "vs_baseline": r,
   ...extra diagnostic fields...}

Measurement methodology: the iteration loop is fused on device
(lax.fori_loop) — per-call dispatch through the TPU relay costs ~1 ms and
would otherwise dominate; this also reflects how the solver actually runs
(one jitted program per restart cycle).

vs_baseline compares measured SpMV throughput against the speed-of-light
estimate from HBM bandwidth (BASELINE.md north star: SpMV is memory-bound,
nnz/s is the roofline metric).
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    out = {}
    dtype = np.float32

    from slepc_tpu.mat.generators import laplacian_2d, laplacian_2d_eigs

    # ---- SpMV throughput (DIA 5-point stencil; Pallas kernel path) ----
    side = 2896  # ~8.4M rows
    A = laplacian_2d(side, side, dtype=dtype)
    n = side * side
    nnz = A.nnz
    ITERS = 50

    # measure the chained-SpMV path the solver loops actually run: the
    # operator stays in the padded layout with a normalize step between
    # applications (exactly the power-iteration inner structure; NOTE a
    # bare back-to-back pallas chain measures ~2x SLOWER than the
    # normalized chain — interleaved elementwise work lets the scheduler
    # overlap the kernel pipeline)
    if A.dp is not None:
        from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

        op_b = DIAPaddedOperator.from_dia(A)
        x = op_b.pad2d(jnp.ones((n,), dtype=dtype))  # 2-D: no relayout
        mult = op_b.mult2d
        out["spmv_kernel"] = "pallas-padded"
    else:
        op_b = A
        x = jnp.ones((n,), dtype=dtype)
        mult = A.mult
        out["spmv_kernel"] = "xla-roll"

    @jax.jit
    def spmv_loop(x):
        def body(i, v):
            y = mult(v)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, ITERS, body, x)

    _log("compiling spmv loop...")
    y = spmv_loop(x)
    jax.block_until_ready(y)  # compile
    _log("spmv compiled; timing...")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = spmv_loop(x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    nnz_per_s = nnz / dt
    out["spmv_rows"] = n
    out["spmv_nnz"] = nnz
    out["spmv_time_per_iter_ms"] = dt * 1e3

    # calibrate ACHIEVABLE bandwidth in this time window (the shared
    # TPU's throughput varies ~2x with neighbor load, so the roofline
    # must be measured in-process): an axpy loop streams 2 passes/iter
    _log("calibrating achievable HBM bandwidth...")
    big = jnp.ones((4096, 4096), dtype)  # 64 MB

    @jax.jit
    def axpy_loop(v):
        return jax.lax.fori_loop(
            0, 20, lambda i, a: a * np.float32(0.9999) + np.float32(1e-6), v)

    jax.block_until_ready(axpy_loop(big))
    tbw = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(axpy_loop(big))
        tbw = min(tbw, time.perf_counter() - t0)
    # diagnostic only: the axpy loop itself reads unreliably through the
    # relay (it measured BELOW the SpMV's own effective bandwidth), so
    # vs_baseline stays defined against the NOMINAL HBM speed of light
    # for round-over-round comparability
    out["hbm_bw_axpy_gb_s"] = 2.0 * 20 * big.size * 4 / tbw / 1e9

    # speed-of-light: bytes per nnz for the 5-diagonal stencil
    bytes_per_nnz = 4.0 + (4.0 + 4.0) / 5.0  # diag + amortized x,y
    hbm_bw = 8.2e11  # ~820 GB/s (TPU v5e-class HBM, nominal)
    sol_nnz_per_s = hbm_bw / bytes_per_nnz
    out["spmv_speed_of_light_nnz_per_s"] = sol_nnz_per_s

    # (interior-interval filtering is exercised in the test suite at
    # resolvable widths; a chip-scale filter bench needs the wide-interval
    # many-pair regime with large ncv — planned with the big-basis path)
    import slepc_tpu as st

    # ---- full solver-iteration cost: one jitted Krylov-Schur cycle on
    # the same operator (SpMV + fused CGS2 + eigh + restart GEMM); the
    # BASELINE gate is orthogonalization+restart <= 20% over pure SpMV ----
    from slepc_tpu.eps.ks_jit import ks_hep_cycle
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    ncv_b = 32
    if A.dp is not None:
        opb = DIAPaddedOperator.from_dia(A)
        v0b = np.asarray(opb.pad2d(jnp.ones((n,), dtype)))
        v0b = v0b / np.linalg.norm(v0b)
    else:
        opb = A
        v0b = np.ones(n, dtype) / np.sqrt(n)
    _log("compiling ks cycle...")
    Vb = jnp.zeros((ncv_b + 1,) + v0b.shape, dtype=dtype).at[0].set(
        jnp.asarray(v0b))
    Hb = jnp.zeros((ncv_b + 1, ncv_b), dtype=dtype)
    keyb = jax.random.PRNGKey(0)
    outb = ks_hep_cycle(opb, Vb, Hb, jnp.asarray(0), 1e-5, keyb,
                        ncv=ncv_b, which="smallest")
    jax.block_until_ready(outb)
    bestc = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outb = ks_hep_cycle(opb, Vb, Hb, jnp.asarray(0), 1e-5, keyb,
                            ncv=ncv_b, which="smallest")
        jax.block_until_ready(outb)
        bestc = min(bestc, time.perf_counter() - t0)
    per_col_ms = bestc / ncv_b * 1e3
    out["ks_cycle_ms"] = bestc * 1e3
    out["ks_cycle_per_column_ms"] = per_col_ms
    out["ks_orth_overhead_vs_spmv"] = per_col_ms / (dt * 1e3) - 1.0

    # ---- partial (omega-recurrence) reorthogonalization: local 3-term
    # orth with Simon's drift monitor — the production policy for large
    # Hermitian solves (semi-orthogonality maintained at sqrt(eps)) ----
    _log("compiling ks cycle (partial reorth)...")
    outp = ks_hep_cycle(opb, Vb, Hb, jnp.asarray(0), 1e-5, keyb,
                        ncv=ncv_b, which="smallest", reorth="partial")
    jax.block_until_ready(outp)
    bestp = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outp = ks_hep_cycle(opb, Vb, Hb, jnp.asarray(0), 1e-5, keyb,
                            ncv=ncv_b, which="smallest", reorth="partial")
        jax.block_until_ready(outp)
        bestp = min(bestp, time.perf_counter() - t0)
    out["ks_cycle_partial_per_column_ms"] = bestp / ncv_b * 1e3

    # ---- k=10 smallest via shift-and-invert (host-factorization
    # workload — runs on the CPU backend like the reference's per-rank
    # LU; the axon TPU plugin cannot host-callback mid-loop) ----
    cpu = None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        pass
    if cpu is not None:
        from slepc_tpu.st.st import STSinvert

        _log("sinvert (cpu backend)...")
        with jax.default_device(cpu):
            side3 = 500
            A3 = laplacian_2d(side3, side3, dtype=np.float64)
            exact3 = laplacian_2d_eigs(side3, side3, k=10)
            t0 = time.perf_counter()
            eps3 = st.EPS(A3, problem_type="hep", nev=10, ncv=32, tol=1e-8)
            eps3.set_target(0.0)
            eps3.set_st(STSinvert([A3], sigma=0.0, hermitian=True,
                                  ksp_opts={"direct_backend": "splu"}))
            eps3.solve()
            ks_dt = time.perf_counter() - t0
            got = np.sort(eps3.eigenvalues[: eps3.nconv].real)[:10]
            out["ks_rows"] = side3 * side3
            out["ks_nconv"] = int(eps3.nconv)
            out["ks_time_s"] = ks_dt
            out["ks_correct"] = bool(eps3.nconv >= 10
                                     and np.allclose(got, exact3, rtol=1e-6))
            out["ks_eigenpairs_per_s"] = eps3.nconv / ks_dt if ks_dt > 0 else 0.0

    _log("done")
    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_per_s / sol_nnz_per_s,
        **out,
    }))


if __name__ == "__main__":
    main()
