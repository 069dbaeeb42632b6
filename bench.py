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
import time

import numpy as np


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

    @jax.jit
    def spmv_loop(x):
        def body(i, x):
            y = A.mult(x)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.ones((n,), dtype=dtype)
    y = spmv_loop(x)
    jax.block_until_ready(y)  # compile
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
    out["spmv_kernel"] = "pallas" if A.dp is not None else "xla-roll"

    # speed-of-light: bytes per nnz for the 5-diagonal stencil
    bytes_per_nnz = 4.0 + (4.0 + 4.0) / 5.0  # diag + amortized x,y
    hbm_bw = 8.2e11  # ~820 GB/s (TPU v5e-class HBM)
    sol_nnz_per_s = hbm_bw / bytes_per_nnz
    out["spmv_speed_of_light_nnz_per_s"] = sol_nnz_per_s

    # ---- k=10 smallest of a 1M-row Laplacian via Chebyshev filter ----
    # (the TPU-native route: the smallest end is relatively clustered
    # against the full spectral width, so plain Krylov is gap-limited;
    # the polynomial filter restores O(1) gaps with SpMV-only work —
    # SURVEY §5 "many-eigenpair strategies", reference STFILTER)
    import slepc_tpu as st

    side2 = 1000
    A2 = laplacian_2d(side2, side2, dtype=dtype)
    exact = laplacian_2d_eigs(side2, side2, k=12)
    lam_max = 8.0
    cut = float(exact[10] * 1.35)  # interval capturing the wanted 10
    t0 = time.perf_counter()
    flt = st.STFilter([A2], interval=(0.0, cut), degree=250,
                      spectral_range=(0.0, lam_max))
    eps = st.EPS(A2, problem_type="hep", which="largest_real",
                 nev=10, ncv=32, tol=1e-4)
    eps.set_st(flt)
    eps.solve()
    ks_dt = time.perf_counter() - t0
    got = np.sort(eps.eigenvalues[: eps.nconv].real)[:10]
    ok = eps.nconv >= 10 and np.allclose(got, exact[:10], rtol=1e-3)
    out["ks_rows"] = side2 * side2
    out["ks_nconv"] = int(eps.nconv)
    out["ks_iters"] = int(eps.its)
    out["ks_time_s"] = ks_dt
    out["ks_correct"] = bool(ok)
    out["ks_eigenpairs_per_s"] = eps.nconv / ks_dt if ks_dt > 0 else 0.0
    out["ks_filter_degree"] = 250

    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_per_s / sol_nnz_per_s,
        **out,
    }))


if __name__ == "__main__":
    main()
