"""Benchmark: SpMV throughput + solver-cycle cost on the real chip.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": N, "unit": "nnz/s", "vs_baseline": r,
   ...extra diagnostic fields...}

Methodology:
  * All loops are device-fused (lax.fori_loop chaining the op) — the TPU
    relay costs ~1 ms per dispatch and caches constant-input repeats, so
    only fused varying-input loops measure the kernel.
  * The shared TPU's achievable HBM bandwidth swings several-fold across
    time windows, so ``vs_baseline`` is CALIBRATED IN-PROCESS: a pure
    stream Pallas kernel moves exactly the DIA SpMV's ideal bytes through
    the same DMA machinery; vs_baseline = stream_time / spmv_time (1.0 =
    the kernel runs at this window's measured speed of light).  The
    nominal-HBM ratio is kept as a secondary field for round-over-round
    comparison.
  * The SpMV measurement runs twice (start and end of the bench) and
    takes the better window.
"""

import json
import sys
import time


import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _timeit(f, x, iters, reps=3):
    import jax

    y = f(x)
    jax.block_until_ready(y)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        y = f(x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {}
    dtype = np.float32
    ITERS = 50

    from slepc_tpu.mat.generators import laplacian_2d, laplacian_2d_eigs
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator, W as LANES

    # ---- DIA SpMV (5-point stencil, 8.4M rows, Pallas padded chain) ----
    side = 2896
    A = laplacian_2d(side, side, dtype=dtype)
    n = side * side
    nnz = A.nnz
    on_tpu = jax.default_backend() == "tpu"

    if A.dp is not None:
        op_b = DIAPaddedOperator.from_dia(A)
        x = op_b.pad2d(jnp.ones((n,), dtype=dtype))
        mult = op_b.mult2d
        out["spmv_kernel"] = "pallas-padded"
    else:
        op_b = A
        x = jnp.ones((n,), dtype=dtype)
        mult = A.mult
        out["spmv_kernel"] = "xla-roll"

    def spmv_loop_fn(mult):
        @jax.jit
        def loop(x):
            def body(i, v):
                y = mult(v)
                return y / jnp.linalg.norm(y)
            return jax.lax.fori_loop(0, ITERS, body, x)
        return loop

    _log("compiling spmv loop...")
    spmv_loop = spmv_loop_fn(mult)
    dt1 = _timeit(spmv_loop, x, ITERS)
    _log(f"spmv pass 1: {dt1*1e3:.3f} ms/iter")

    # ---- in-window speed-of-light: pure-stream kernel moving the same
    # ideal byte count (diags once + x once + y once) ----
    Rb = 128
    nblk = -(-n // (Rb * LANES))
    nd = len(A.offsets)
    dp_cal = jnp.ones((nd, nblk * Rb, LANES), dtype)

    def _stream_kernel(xc_ref, d_ref, y_ref):
        acc = None
        for k in range(nd):
            t = d_ref[k] * xc_ref[:]
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    @jax.jit
    def stream_loop(x):
        def body(i, v):
            y = pl.pallas_call(
                _stream_kernel,
                grid=(nblk,),
                in_specs=[
                    pl.BlockSpec((Rb, LANES), lambda i: (i + 1, i * 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nd, Rb, LANES),
                                 lambda i: (i * 0, i, i * 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i + 1, i * 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(((nblk + 2) * Rb, LANES),
                                               jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(v, dp_cal)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, ITERS, body, x)

    _log("calibrating stream speed-of-light...")
    xs = jnp.ones(((nblk + 2) * Rb, LANES), dtype)
    dt_stream = _timeit(stream_loop, xs, ITERS)
    stream_bytes = (nd * n + 2 * n) * 4
    out["stream_bw_gb_s"] = stream_bytes / dt_stream / 1e9
    _log(f"stream: {dt_stream*1e3:.3f} ms/iter = "
         f"{out['stream_bw_gb_s']:.0f} GB/s achievable")

    # ---- general-sparsity (AIJ) fast path: hybrid diagonal/gather ELL
    # on a 9-point variable-coefficient banded CSR (1M rows) ----
    try:
        import scipy.sparse as sp

        from slepc_tpu.ops.ell_pallas import GELLPaddedOperator

        side2 = 1024
        n2 = side2 * side2
        rng = np.random.default_rng(0)
        offs = [-side2 - 1, -side2, -side2 + 1, -1, 0, 1,
                side2 - 1, side2, side2 + 1]
        _log("building + packing hybrid-ELL bench matrix (1M rows)...")
        Am = sp.diags([rng.standard_normal(n2).astype(dtype) for _ in offs],
                      offs, shape=(n2, n2), format="csr").astype(dtype)
        opg = GELLPaddedOperator.from_scipy(Am, block_rows=128)
        xg = opg.pad2d(jnp.ones((n2,), dtype))
        gell_loop = spmv_loop_fn(opg.mult2d)
        _log("compiling hybrid-ELL loop...")
        dtg = _timeit(gell_loop, xg, ITERS)
        out["aij_nnz_per_s"] = Am.nnz / dtg
        gbytes = opg.stream_bytes + 2 * n2 * 4
        out["aij_eff_gb_s"] = gbytes / dtg / 1e9
        out["aij_vs_stream"] = out["aij_eff_gb_s"] / out["stream_bw_gb_s"]
        out["aij_rows"] = n2
        out["aij_nnz"] = int(Am.nnz)
        _log(f"aij: {dtg*1e3:.3f} ms/iter = {Am.nnz/dtg/1e9:.1f} Gnnz/s "
             f"({out['aij_vs_stream']:.2f} of stream SoL)")
    except Exception as e:  # pragma: no cover - keep the bench alive
        _log(f"aij bench failed: {e!r}")

    # ---- f64 double-single kernel ----
    try:
        from slepc_tpu.ops.dia_pallas import DIAPaddedOperatorDS

        A64 = laplacian_2d(side, side, dtype=np.float64)
        opds = DIAPaddedOperatorDS.from_dia(A64)
        x64 = opds.pad2d(jnp.ones((n,), np.float64))
        ds_loop = spmv_loop_fn(opds.mult2d)
        _log("compiling f64 double-single loop...")
        dtds = _timeit(ds_loop, x64, ITERS)
        out["spmv_f64_nnz_per_s"] = nnz / dtds
        out["spmv_f64_vs_f32"] = dt1 / dtds
        _log(f"f64-ds: {dtds*1e3:.3f} ms/iter = {nnz/dtds/1e9:.1f} Gnnz/s "
             f"({out['spmv_f64_vs_f32']:.2f}x of f32)")
        # accuracy spot check against host f64
        yds = np.asarray(opds.unpad(opds.mult2d(x64)))
        yref = A64.to_scipy() @ np.ones(n)
        out["spmv_f64_relerr"] = float(
            np.abs(yds - yref).max() / max(np.abs(yref).max(), 1e-300))
    except Exception as e:  # pragma: no cover
        _log(f"f64 bench failed: {e!r}")

    # ---- full solver-iteration cost: jitted KS cycles on the same
    # operator.  BASELINE gate: orth+restart <= 20% over pure SpMV; the
    # blocked cycle (BCGS2 per b columns) is the bandwidth-lean path. ----
    from slepc_tpu.eps.ks_jit import ks_hep_cycle, ks_hep_cycle_blocked

    ncv_b = 32
    v0b = np.asarray(op_b.pad2d(jnp.ones((n,), dtype))) if A.dp is not None \
        else (np.ones(n, dtype) / np.sqrt(n))
    v0b = v0b / np.linalg.norm(v0b)
    keyb = jax.random.PRNGKey(0)
    Hb = jnp.zeros((ncv_b + 1, ncv_b), dtype=dtype)
    Vb = jnp.zeros((ncv_b + 1,) + v0b.shape, dtype=dtype).at[0].set(
        jnp.asarray(v0b))

    def _chain_cycles(f, V, H, ncycles=4):
        """Chained restart cycles: every timed call has DIFFERENT inputs
        (the relay replays constant-input repeats from cache) and the
        steady-state extension size ncv-kl ~ ncv/2 matches production."""
        o = f(V, H, jnp.asarray(0))
        jax.block_until_ready(o)
        st = (o[0], o[1], o[2])
        t0 = time.perf_counter()
        for _ in range(ncycles):
            o = f(st[0], st[1], st[2])
            st = (o[0], o[1], o[2])
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / ncycles

    cols = ncv_b // 2  # steady-state new columns per chained cycle

    _log("compiling ks cycle (full CGS2)...")
    dtc = _chain_cycles(
        lambda V, H, j: ks_hep_cycle(op_b, V, H, j, 1e-5, keyb, ncv=ncv_b,
                                     which="smallest"), Vb, Hb)
    out["ks_cycle_ms"] = dtc * 1e3
    out["ks_cycle_per_column_ms"] = dtc / cols * 1e3

    _log("compiling ks cycle (partial/omega reorth)...")
    dtp = _chain_cycles(
        lambda V, H, j: ks_hep_cycle(op_b, V, H, j, 1e-5, keyb, ncv=ncv_b,
                                     which="smallest", reorth="partial"),
        Vb, Hb)
    out["ks_cycle_partial_per_column_ms"] = dtp / cols * 1e3

    _log("compiling blocked ks cycle (b=8)...")
    bsz = 8
    Vblk = jnp.zeros((ncv_b + bsz,) + v0b.shape, dtype=dtype)
    # orthonormal random block rows (host QR on the flats)
    rngb = np.random.default_rng(1)
    Mb = rngb.standard_normal((int(np.prod(v0b.shape)), bsz)).astype(dtype)
    Mb[:, 0] = np.asarray(v0b).ravel()
    Qb, _ = np.linalg.qr(Mb)
    for i in range(bsz):
        Vblk = Vblk.at[i].set(jnp.asarray(Qb[:, i].reshape(v0b.shape)))
    Hblk = jnp.zeros((ncv_b + bsz, ncv_b), dtype=dtype)
    dtb = _chain_cycles(
        lambda V, H, j: ks_hep_cycle_blocked(op_b, V, H, j, 1e-5, keyb,
                                             ncv=ncv_b, b=bsz,
                                             which="smallest"), Vblk, Hblk)
    out["ks_cycle_blocked_per_column_ms"] = dtb / cols * 1e3

    # ---- second SpMV pass (window hedge) ----
    dt2 = _timeit(spmv_loop, x, ITERS)
    dt = min(dt1, dt2)
    _log(f"spmv pass 2: {dt2*1e3:.3f} ms/iter; best {dt*1e3:.3f}")
    nnz_per_s = nnz / dt
    out["spmv_rows"] = n
    out["spmv_nnz"] = nnz
    out["spmv_time_per_iter_ms"] = dt * 1e3
    out["vs_baseline_nominal"] = nnz_per_s / (8.2e11 / 5.6)
    # roofline = fastest byte-mover observed in-process (the naive stream
    # kernel, or the SpMV itself on its own actual bytes when it beats
    # the stream — the shared chip's window shifts between measurements)
    actual_bytes = (len(A.offsets) * n + 2.25 * n) * 4  # v3 halo re-reads
    roof_bw = max(stream_bytes / dt_stream, actual_bytes / dt)
    out["roofline_bw_gb_s"] = roof_bw / 1e9
    vs_cal = (stream_bytes / dt) / roof_bw
    out["ks_orth_overhead_vs_spmv"] = \
        out["ks_cycle_blocked_per_column_ms"] / (dt * 1e3) - 1.0
    out["ks_orth_overhead_full_cgs2"] = \
        out["ks_cycle_per_column_ms"] / (dt * 1e3) - 1.0

    # ---- k=10 smallest via shift-and-invert (host-factorization
    # workload, CPU backend — the axon plugin cannot host-callback) ----
    cpu = None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        pass
    if cpu is not None:
        import slepc_tpu as st
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
        # calibrated: 1.0 == ideal bytes moved at this window's measured
        # achievable bandwidth (in-process roofline)
        "vs_baseline": vs_cal,
        **out,
    }))


if __name__ == "__main__":
    main()
