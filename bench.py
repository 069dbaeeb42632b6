"""Benchmark: SpMV throughput + Krylov-Schur eigensolve on the real chip.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": N, "unit": "nnz/s", "vs_baseline": r,
   ...extra diagnostic fields...}

vs_baseline compares measured SpMV throughput against the speed-of-light
estimate from HBM bandwidth (the north-star framing in BASELINE.md: SpMV is
memory-bound; nnz/s is the roofline metric).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}
    dtype = np.float32

    from slepc_tpu.mat.generators import laplacian_2d

    # ---- SpMV throughput (DIA 5-point stencil) ----
    side = 2896  # ~8.4M rows
    A = laplacian_2d(side, side, dtype=dtype)
    n = side * side
    nnz = A.nnz
    x = jnp.ones((n,), dtype=dtype)

    spmv = jax.jit(lambda v: A.mult(v))
    y = spmv(x)
    jax.block_until_ready(y)  # compile
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        x = spmv(x)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    nnz_per_s = nnz * iters / dt
    out["spmv_rows"] = n
    out["spmv_nnz"] = nnz
    out["spmv_time_per_iter_ms"] = dt / iters * 1e3

    # speed-of-light: bytes moved per nnz for the 5-diagonal stencil
    #   diag data 4B/nnz + x read + y write amortized over 5 nnz/row
    bytes_per_nnz = 4.0 + (4.0 + 4.0) / 5.0
    hbm_bw = 8.2e11  # ~820 GB/s (TPU v5e-class HBM)
    sol_nnz_per_s = hbm_bw / bytes_per_nnz
    out["spmv_speed_of_light_nnz_per_s"] = sol_nnz_per_s

    # ---- Krylov-Schur: k=10 smallest of a 1M-row 2-D Laplacian ----
    import slepc_tpu as st
    from slepc_tpu.mat.generators import laplacian_2d_eigs

    side2 = 1000
    A2 = laplacian_2d(side2, side2, dtype=dtype)
    t0 = time.perf_counter()
    eps = st.EPS(A2, problem_type="hep", which="smallest_real",
                 nev=10, ncv=64, tol=1e-5)
    eps.solve()
    ks_dt = time.perf_counter() - t0
    exact = laplacian_2d_eigs(side2, side2, k=10)
    got = np.sort(eps.eigenvalues[: eps.nconv].real)[:10]
    ok = eps.nconv >= 10 and np.allclose(got, exact, rtol=1e-3)
    out["ks_rows"] = side2 * side2
    out["ks_nconv"] = int(eps.nconv)
    out["ks_iters"] = int(eps.its)
    out["ks_time_s"] = ks_dt
    out["ks_correct"] = bool(ok)
    out["ks_eigenpairs_per_s"] = eps.nconv / ks_dt if ks_dt > 0 else 0.0

    print(json.dumps({
        "metric": "spmv_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_per_s / sol_nnz_per_s,
        **out,
    }))


if __name__ == "__main__":
    main()
