"""Benchmark: SpMV throughput + solver-cycle cost + flagship solve on TPU.

Prints ONE JSON line:
  {"metric": "spmv_nnz_per_s", "value": N, "unit": "nnz/s", "vs_baseline": r,
   ...extra diagnostic fields...}

Methodology (hard rules, learned the hard way — r2 VERDICT items 1-3):
  * CACHE-REPLAY-PROOF: the axon relay replays ANY constant-input repeat
    from cache (a repeated call can read 0.00 ms).  Every timed repetition
    here (a) chains the previous output into the next input AND (b) injects
    a distinct scalar perturbation per call, so no two dispatches ever see
    identical bytes.  A pass that is >5x faster than its sibling is
    rejected as a replay artifact.
  * All kernel loops are device-fused (lax.fori_loop chaining the op) —
    per-dispatch relay latency is ~1 ms.
  * Restart cycles are chained with the j0 handoff as a FRESH HOST int32:
    feeding the previous cycle's device scalar back in makes the identical
    executable ~3x slower (tools/diag_tail.py; production ks_hep_solve
    does the same).
  * ``vs_baseline`` = (ideal_bytes / measured_time) / best in-process
    stream bandwidth — a smooth ratio that can exceed or fall below 1
    (the r2 max() formulation saturated at a constant).
  * The shared TPU's achievable bandwidth swings ~2x across time windows:
    only in-process comparisons are meaningful.
"""

import json
import os
import sys
import time


import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _timeit_chain(loop, x, iters, reps=3):
    """loop(x, t) -> (y, scalar); chains y->x with per-call t.

    Timing is per-rep block_until_ready, VERIFIED by a final scalar
    readback: the axon relay has been observed returning from
    block_until_ready before execution completed (a whole pass read
    0.006 ms/iter and the backlog drained at the next D2H) — if the
    drain after the last rep exceeds the measured total, the block-based
    numbers lied and the honest average (total wall incl. drain) is used.
    Returns (seconds_per_iter, replay_suspect)."""
    import jax
    import jax.numpy as jnp

    y, s = loop(x, jnp.float32(1e-6))
    jax.block_until_ready(y)
    float(s)  # drain everything up to here
    ts = []
    t_all0 = time.perf_counter()
    for k in range(reps):
        t0 = time.perf_counter()
        y, s = loop(y, jnp.float32((k + 2) * 1e-6))
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    float(s)  # force completion of the whole chain
    t_total = time.perf_counter() - t_all0
    ts = sorted(ts)
    suspect = ts[-1] > 5 * ts[0]
    best = ts[len(ts) // 2] if suspect else ts[0]
    if t_total > 2.0 * sum(ts) + 0.1:
        # block_until_ready under-reported: fall back to the drained wall
        return t_total / reps / iters, True
    return best / iters, suspect


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {}
    dtype = np.float32
    ITERS = 50

    # ---- global deadline + cumulative emission (VERDICT r4 weak #1:
    # BENCH_r04 was rc=124/parsed=null because the single JSON print sat
    # at the very end and the driver timeout killed the process first).
    # The driver parses the LAST stdout line, so a cumulative JSON line
    # after EVERY stage makes any timeout still yield everything
    # completed so far; the deadline makes stages self-limit so the
    # process normally exits cleanly well inside the driver budget. ----
    t_main0 = time.perf_counter()
    deadline = t_main0 + float(os.environ.get("BENCH_DEADLINE_S", "3300"))
    headline = {"value": 0.0, "vs_baseline": 0.0}

    def _remaining():
        return deadline - time.perf_counter()

    def _emit(stage):
        out["last_stage"] = stage
        out["elapsed_s"] = round(time.perf_counter() - t_main0, 1)
        print(json.dumps({
            "metric": "spmv_nnz_per_s",
            "value": headline["value"],
            "unit": "nnz/s",
            # calibrated: ideal bytes at this window's measured achievable
            # stream bandwidth (in-process roofline; smooth around 1.0)
            "vs_baseline": headline["vs_baseline"],
            **out,
        }), flush=True)

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

    from functools import partial as _partial

    @jax.jit
    def _op_loop(opx, x, t):
        # operator as a TRACED pytree arg: closure capture would embed the
        # diagonal arrays as HLO constants (downloaded through the relay
        # and re-uploaded to the compiler — measured failure mode)
        multx = opx.mult2d if hasattr(opx, "mult2d") else opx.mult
        x = x * (1.0 + t)  # vary inputs: no relay replay, no fixpoint
        def body(i, v):
            y = multx(v)
            return y / jnp.linalg.norm(y)
        y = jax.lax.fori_loop(0, ITERS, body, x)
        yf = y.reshape(-1)
        return y, jnp.vdot(yf[1024:1032], yf[1024:1032]).real

    def spmv_loop_fn(opx):
        return _partial(_op_loop, opx)

    _log("compiling spmv loop...")
    spmv_loop = spmv_loop_fn(op_b)
    dt1, sus1 = _timeit_chain(spmv_loop, x, ITERS)
    _log(f"spmv pass 1: {dt1*1e3:.3f} ms/iter (replay_suspect={sus1})")

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
    def stream_loop_impl(dp_cal, x, t):
        x = x * (1.0 + t)
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
        y = jax.lax.fori_loop(0, ITERS, body, x)
        yf = y.reshape(-1)
        return y, jnp.vdot(yf[1024:1032], yf[1024:1032]).real

    stream_bytes = (nd * n + 2 * n) * 4

    def measure_stream():
        """Achievable-bandwidth sample; re-callable in a LATER time window
        (the shared chip swings ~2x between windows — two samples pin
        chip weather vs real regression, VERDICT r3 item 9).  Arrays are
        device-generated, so a late re-run costs nothing to rebuild."""
        dpc = jnp.ones((nd, nblk * Rb, LANES), dtype)
        xs = jnp.ones(((nblk + 2) * Rb, LANES), dtype)
        dt_s, sus = _timeit_chain(lambda x, t: stream_loop_impl(dpc, x, t),
                                  xs, ITERS)
        return stream_bytes / dt_s / 1e9, dt_s, sus

    def stream_loop(x, t):
        return stream_loop_impl(dp_cal, x, t)

    _log("calibrating stream speed-of-light...")
    out["stream_bw_gb_s"], dt_stream, sus_s = measure_stream()
    _log(f"stream: {dt_stream*1e3:.3f} ms/iter = "
         f"{out['stream_bw_gb_s']:.0f} GB/s achievable "
         f"(replay_suspect={sus_s})")
    # provisional headline from pass 1 (refined after pass 2)
    headline["value"] = nnz / dt1
    headline["vs_baseline"] = dt_stream / dt1
    _emit("stream1")

    # ---- general-sparsity (AIJ) fast path: hybrid diagonal/gather ELL
    # on a 9-point variable-coefficient banded CSR (1M rows) ----
    try:
        import scipy.sparse as sp

        from slepc_tpu.ops.ell_pallas import GELLPaddedOperator

        side2 = 2048
        n2 = side2 * side2
        rng = np.random.default_rng(0)
        offs = [-side2 - 1, -side2, -side2 + 1, -1, 0, 1,
                side2 - 1, side2, side2 + 1]
        _log("building + packing hybrid-ELL bench matrix (1M rows)...")
        Am = sp.diags([rng.standard_normal(n2).astype(dtype) for _ in offs],
                      offs, shape=(n2, n2), format="csr").astype(dtype)
        # AUTO route (mat/linop.to_gell): detects the all-dense-diagonal
        # structure and picks the 512-lane DIA roll kernel; genuinely
        # irregular matrices fall to the 128-lane hybrid gather kernel
        from slepc_tpu.mat.linop import AIJOperator

        opa = AIJOperator.from_scipy(Am, keep_host=True)
        opg = opa.to_gell()
        out["aij_kernel"] = type(opg).__name__
        xg = opg.pad2d(jnp.ones((n2,), dtype))
        gell_loop = spmv_loop_fn(opg)
        _log(f"compiling aij auto loop ({out['aij_kernel']})...")
        dtg, sus_g = _timeit_chain(gell_loop, xg, ITERS)
        out["aij_nnz_per_s"] = Am.nnz / dtg
        gbytes = getattr(opg, "stream_bytes", Am.nnz * 4) + 2 * n2 * 4
        out["aij_eff_gb_s"] = gbytes / dtg / 1e9
        out["aij_vs_stream"] = out["aij_eff_gb_s"] / out["stream_bw_gb_s"]
        out["aij_rows"] = n2
        out["aij_nnz"] = int(Am.nnz)
        _log(f"aij: {dtg*1e3:.3f} ms/iter = {Am.nnz/dtg/1e9:.1f} Gnnz/s "
             f"({out['aij_vs_stream']:.2f} of stream SoL, "
             f"replay_suspect={sus_g})")
        del opa, opg, xg, gell_loop

        # gather-tier case: banded stencil PLUS scattered perturbations
        # (5% of rows get 4 random in-band entries) — exercises the
        # dynamic_gather slots that irregular sparsity routes through
        npert = n2 // 20
        rp = rng.integers(0, n2, npert)
        # spread capped at +-2000 rows: the gather tier packs one slot
        # per distinct 64-row block offset, and slots + diagonals must
        # fit the kernel's 80-slot budget (+-4000 produced 119 slots —
        # permanently-failing sub-case in the first r4 bench runs)
        cp = np.clip(rp + rng.integers(-2000, 2000, npert), 0, n2 - 1)
        P = sp.csr_matrix((rng.standard_normal(npert).astype(dtype),
                           (rp, cp)), shape=(n2, n2))
        Am2 = (Am + P).tocsr().astype(dtype)
        opg2 = GELLPaddedOperator.from_scipy(Am2, block_rows=128)
        xg2 = opg2.pad2d(jnp.ones((n2,), dtype))
        _log(f"compiling hybrid gather loop ({len(opg2.qr_slots)} dia + "
             f"{len(opg2.dslots)} gather slots)...")
        dtg2, sus_g2 = _timeit_chain(spmv_loop_fn(opg2), xg2, ITERS)
        out["aij_gather_nnz_per_s"] = Am2.nnz / dtg2
        g2bytes = opg2.stream_bytes + 2 * n2 * 4
        out["aij_gather_eff_gb_s"] = g2bytes / dtg2 / 1e9
        out["aij_gather_vs_stream"] = (out["aij_gather_eff_gb_s"]
                                       / out["stream_bw_gb_s"])
        _log(f"aij gather: {dtg2*1e3:.3f} ms/iter = "
             f"{Am2.nnz/dtg2/1e9:.1f} Gnnz/s "
             f"({out['aij_gather_vs_stream']:.2f} of stream SoL, "
             f"replay_suspect={sus_g2})")
        del opg2, xg2
    except Exception as e:  # pragma: no cover - keep the bench alive
        _log(f"aij bench failed: {e!r}")
    _emit("aij")

    # ---- f64 double-single kernel ----
    try:
        from slepc_tpu.ops.dia_pallas import DIAPaddedOperatorDS

        A64 = laplacian_2d(side, side, dtype=np.float64)
        opds = DIAPaddedOperatorDS.from_dia(A64)
        x64 = opds.pad2d(jnp.ones((n,), np.float64))
        ds_loop = spmv_loop_fn(opds)
        _log("compiling f64 double-single loop...")
        dtds, sus_d = _timeit_chain(ds_loop, x64, ITERS)
        out["spmv_f64_nnz_per_s"] = nnz / dtds
        out["spmv_f64_vs_f32"] = dt1 / dtds
        _log(f"f64-ds: {dtds*1e3:.3f} ms/iter = {nnz/dtds/1e9:.1f} Gnnz/s "
             f"({out['spmv_f64_vs_f32']:.2f}x of f32, "
             f"replay_suspect={sus_d})")
        # accuracy spot check vs host f64 on a RANDOM vector (x=ones on an
        # integer-valued Laplacian cancels exactly in f32 — vacuous)
        xr = np.random.default_rng(3).standard_normal(n)
        xrp = opds.pad2d(jnp.asarray(xr))
        yds = np.asarray(opds.unpad(opds.mult2d(xrp)))
        yref = A64.to_scipy() @ xr
        out["spmv_f64_relerr"] = float(
            np.abs(yds - yref).max() / max(np.abs(yref).max(), 1e-300))
        _log(f"f64-ds relerr (random x): {out['spmv_f64_relerr']:.2e}")
    except Exception as e:  # pragma: no cover
        _log(f"f64 bench failed: {e!r}")
    _emit("f64_ds")

    # ---- full solver-iteration cost: jitted KS cycles on the same
    # operator.  BASELINE gate: orth+restart <= 20% over pure SpMV. ----
    from slepc_tpu.eps.ks_jit import (get_ks_hep_cycle,
                                      get_ks_hep_cycle_blocked)

    ncv_b = 32
    v0b = np.asarray(op_b.pad2d(jnp.ones((n,), dtype))) if A.dp is not None \
        else (np.ones(n, dtype) / np.sqrt(n))
    v0b = v0b / np.linalg.norm(v0b)
    keyb = jax.random.PRNGKey(0)
    Hb = jnp.zeros((ncv_b + 1, ncv_b), dtype=dtype)
    Vb = jnp.zeros((ncv_b + 1,) + v0b.shape, dtype=dtype).at[0].set(
        jnp.asarray(v0b))

    def _chain_cycles(f, V, H, ncycles=4):
        """Chained restart cycles: every timed call has DIFFERENT inputs;
        j0 handed off as a fresh host int32 (the production pattern)."""
        o = f(V, H, jnp.asarray(np.int32(0)))
        jax.block_until_ready(o)
        st = (o[0], o[1], o[2])
        t0 = time.perf_counter()
        for _ in range(ncycles):
            o = f(st[0], st[1], jnp.asarray(np.int32(int(st[2]))))
            st = (o[0], o[1], o[2])
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / ncycles

    cols = ncv_b // 2  # steady-state new columns per chained cycle

    cyc_xla = get_ks_hep_cycle(op_b, keyb, ncv_b, "smallest", orth="xla")
    _log("compiling ks cycle (full CGS2, xla orth)...")
    dtc = _chain_cycles(lambda V, H, j: cyc_xla(V, H, j, 1e-5), Vb, Hb)
    out["ks_cycle_ms"] = dtc * 1e3
    out["ks_cycle_per_column_ms"] = dtc / cols * 1e3
    _log(f"ks xla: {dtc/cols*1e3:.2f} ms/col")

    try:
        cyc_pal = get_ks_hep_cycle(op_b, keyb, ncv_b, "smallest",
                                   orth="pallas")
        _log("compiling ks cycle (full CGS2, pallas orth)...")
        dtp = _chain_cycles(lambda V, H, j: cyc_pal(V, H, j, 1e-5), Vb, Hb)
        out["ks_cycle_pallas_per_column_ms"] = dtp / cols * 1e3
        _log(f"ks pallas: {dtp/cols*1e3:.2f} ms/col")
        if dtp < dtc:
            out["ks_cycle_per_column_ms"] = dtp / cols * 1e3
    except Exception as e:
        _log(f"pallas cycle failed: {e!r}")

    try:
        cyc_part = get_ks_hep_cycle(op_b, keyb, ncv_b, "smallest",
                                    reorth="partial")
        _log("compiling ks cycle (partial/omega reorth)...")
        dtpa = _chain_cycles(lambda V, H, j: cyc_part(V, H, j, 1e-5), Vb, Hb)
        out["ks_cycle_partial_per_column_ms"] = dtpa / cols * 1e3
        _log(f"ks partial: {dtpa/cols*1e3:.2f} ms/col")
    except Exception as e:
        _log(f"partial cycle failed: {e!r}")

    try:
        bsz = 8
        cyc_blk = get_ks_hep_cycle_blocked(op_b, keyb, ncv_b, bsz,
                                           "smallest")
        Vblk = jnp.zeros((ncv_b + bsz,) + v0b.shape, dtype=dtype)
        rngb = np.random.default_rng(1)
        Mb = rngb.standard_normal((int(np.prod(v0b.shape)),
                                   bsz)).astype(dtype)
        Mb[:, 0] = np.asarray(v0b).ravel()
        Qb, _ = np.linalg.qr(Mb)
        for i in range(bsz):
            Vblk = Vblk.at[i].set(jnp.asarray(Qb[:, i].reshape(v0b.shape)))
        if hasattr(op_b, "mask2d"):
            Vblk = Vblk * op_b.mask2d[None]
        Hblk = jnp.zeros((ncv_b + bsz, ncv_b), dtype=dtype)
        _log("compiling blocked ks cycle (b=8)...")
        dtb = _chain_cycles(lambda V, H, j: cyc_blk(V, H, j, 1e-5),
                            Vblk, Hblk)
        out["ks_cycle_blocked_per_column_ms"] = dtb / cols * 1e3
        _log(f"ks blocked: {dtb/cols*1e3:.2f} ms/col")
    except Exception as e:
        _log(f"blocked cycle failed: {e!r}")

    # ---- f64 restart-rotation A/B: DS Pallas kernel vs XLA emulation
    # (the r5-continuation lever; records the flagship rotation tier's
    # in-window ratio machine-readably).  NOTE the first warm execution
    # of a fresh executable through the relay can read ~15x slow
    # (executable page-in) — two warm reps, min taken. ----
    if on_tpu and _remaining() > 600:
        try:
            import slepc_tpu.ops.rotate_pallas as _rp
            from slepc_tpu.eps.ks_jit import _rotate_basis as _rot_xla

            Kr, Pr, Rr = 48, 40, 2048
            keyr = jax.random.PRNGKey(7)
            Vr64 = jax.random.normal(keyr, (Kr, Rr, LANES), jnp.float64)
            Qr = jnp.asarray(np.linalg.qr(np.random.default_rng(7)
                             .standard_normal((Kr, Kr)))[0][:, :Pr])
            NITR = 4

            def _rot_chain(rot):
                def body(i, Vc):
                    o = rot(Qr, Vc)
                    return Vc.at[:Pr].set(o * np.float64(0.9999)) \
                             .at[0, 0, 0].add(1e-9 * (i + 1))
                return jax.jit(
                    lambda Vc: jax.lax.fori_loop(0, NITR, body, Vc))

            def _rot_time(f):
                float(f(Vr64)[0, 0, 0])  # compile + first (slow) exec
                ts = []
                for r in range(2):
                    t0 = time.perf_counter()
                    o = f(Vr64.at[0, 0, 0].add((r + 1) * 1e-7))
                    float(o[0, 0, 0])
                    ts.append((time.perf_counter() - t0) / NITR)
                return min(ts)

            t_ds = _rot_time(_rot_chain(
                lambda q, v: _rp.rotate_basis_ds(q, v)))
            t_xl = _rot_time(_rot_chain(
                lambda q, v: _rot_xla(q, v, Kr)))
            out["rot_ds_ms"] = t_ds * 1e3
            out["rot_xla_f64_ms"] = t_xl * 1e3
            out["rot_ds_speedup"] = t_xl / t_ds
            _log(f"rotation A/B (48x40 x {Rr}x{LANES} f64): "
                 f"ds {t_ds*1e3:.1f} ms vs xla {t_xl*1e3:.1f} ms "
                 f"({t_xl/t_ds:.1f}x)")
            del Vr64
        except Exception as e:
            _log(f"rotation A/B failed: {e!r}")

    # ---- second SpMV pass (window hedge) ----
    dt2, sus2 = _timeit_chain(spmv_loop, x, ITERS)
    dt = min(dt1, dt2)
    if max(dt1, dt2) > 5 * min(dt1, dt2):
        _log("WARNING: spmv passes differ >5x — replay artifact, "
             "using the slower pass")
        dt = max(dt1, dt2)
    _log(f"spmv pass 2: {dt2*1e3:.3f} ms/iter; using {dt*1e3:.3f}")
    nnz_per_s = nnz / dt
    out["spmv_rows"] = n
    out["spmv_nnz"] = nnz
    out["spmv_time_per_iter_ms"] = dt * 1e3
    out["vs_baseline_nominal"] = nnz_per_s / (8.2e11 / 5.6)
    # calibrated headline: ideal bytes at the measured achievable stream
    # bandwidth (smooth; >1 means the SpMV moves its ideal bytes faster
    # than the naive stream kernel — e.g. better pipelining)
    vs_cal = (stream_bytes / dt) / (stream_bytes / dt_stream)
    out["roofline_bw_gb_s"] = out["stream_bw_gb_s"]
    out["ks_orth_overhead_full_cgs2"] = \
        out["ks_cycle_per_column_ms"] / (dt * 1e3) - 1.0
    if "ks_cycle_blocked_per_column_ms" in out:
        out["ks_orth_overhead_vs_spmv"] = \
            out["ks_cycle_blocked_per_column_ms"] / (dt * 1e3) - 1.0
    headline["value"] = nnz_per_s
    headline["vs_baseline"] = vs_cal
    _emit("kernels")

    # ---- second stream-bandwidth sample IMMEDIATELY after the kernel
    # stages (VERDICT r4 weak #5: sampling it after flagship+sinvert put
    # it past the timeout and round 4 recorded zero second windows); a
    # third sample runs at the very end if time remains ----
    if on_tpu:
        try:
            bw2, dts2, sus2s = measure_stream()
            out["stream_bw_gb_s_2"] = bw2
            _log(f"stream window 2: {bw2:.0f} GB/s "
                 f"(window 1 was {out['stream_bw_gb_s']:.0f})")
        except Exception as e:
            _log(f"stream window-2 sample failed: {e!r}")
        _emit("stream2")

    # ---- fused vs host GD A/B (VERDICT r3 item 9) ----
    if on_tpu and os.environ.get("BENCH_GD", "1") != "0" \
            and _remaining() > 400:
        try:
            from slepc_tpu.mat.linop import DIAOperator
            import slepc_tpu as stt
            from slepc_tpu.st.st import STPrecond
            from slepc_tpu.sys.sort import Which as _W

            ng = 1 << 20
            # well-separated smallest eigenvalues (three detached
            # outliers) so both loops converge within the budget and the
            # A/B compares wall-clock at equal work.  f64: under REAL GD
            # (the r5 solver= fix) the f32 residual floor left the fused
            # cycle at nconv=0 after 200 cycles and degenerated the host
            # Gram — the A/B's subject is fused-vs-host orchestration
            # cost, not f32 stress
            dg = np.linspace(10.0, 30.0, ng).astype(np.float64)
            dg[:3] = [1.0, 2.0, 3.0]
            lo = np.zeros(ng, np.float64)
            hi = np.zeros(ng, np.float64)
            hi[:-1] = -1.0
            lo[1:] = -1.0
            Ag = DIAOperator((-1, 0, 1), np.stack([lo, dg, hi]))
            gd_out = {}
            for fused in (True, False):
                # two solves, time the SECOND: the first pays the jit
                # compile (~35 s for the fused cycle through the remote
                # relay) — r3's gd_speedup_per_expansion=0.34 verdict was
                # entirely this artifact (steady state measured 4 ms vs
                # 385 ms/expansion, tools/diag_r4.py)
                for attempt in (0, 1):
                    epsg = stt.EPS(Ag, problem_type="hep",
                                   which=_W.SMALLEST_REAL, nev=3, ncv=24,
                                   max_it=200 if fused else 120, tol=1e-6,
                                   solver="gd")
                    epsg.set_st(STPrecond([Ag]))
                    epsg.gd_fused = fused
                    t0 = time.perf_counter()
                    epsg.solve()
                    gd_out[fused] = (time.perf_counter() - t0, epsg.nconv,
                                     epsg.its, epsg.expansions)
                _log(f"gd fused={fused}: {gd_out[fused][0]:.1f}s warm "
                     f"nconv={epsg.nconv} its={epsg.its} "
                     f"expansions={epsg.expansions}")
            out["gd_fused_s"] = gd_out[True][0]
            out["gd_host_s"] = gd_out[False][0]
            out["gd_fused_nconv"] = gd_out[True][1]
            out["gd_host_nconv"] = gd_out[False][1]
            # per-EXPANSION cost from REAL counts (VERDICT r4 weak #3:
            # the old `its * 12` estimate was a guess; both solver paths
            # now count actual basis-growth steps in eps.expansions)
            out["gd_fused_expansions"] = gd_out[True][3]
            out["gd_host_expansions"] = gd_out[False][3]
            out["gd_fused_ms_per_expansion"] = (
                gd_out[True][0] / max(gd_out[True][3], 1) * 1e3)
            out["gd_host_ms_per_expansion"] = (
                gd_out[False][0] / max(gd_out[False][3], 1) * 1e3)
            out["gd_speedup_per_expansion"] = (
                out["gd_host_ms_per_expansion"]
                / max(out["gd_fused_ms_per_expansion"], 1e-9))
        except Exception as e:
            _log(f"gd A/B failed: {e!r}")
        _emit("gd")


    # ---- FLAGSHIP (BASELINE.md north star): k=20 smallest of a 10.35M-row
    # 3-D Laplacian to 1e-8 relative residual, f64 via the double-single
    # kernel, fully-jitted KS cycles, everything generated and verified
    # ON DEVICE. ----
    if on_tpu and os.environ.get("BENCH_FLAGSHIP", "1") != "0" \
            and _remaining() > 900:
        # free the kernel-bench working set first: the 5.4 GB f64 basis
        # plus its rotation temporary must fit next to the operator
        try:
            del Vb, Hb
        except NameError:
            pass
        try:
            del Vblk, Hblk
        except NameError:
            pass
        try:
            del opg, xg
        except NameError:
            pass
        try:
            del opds, x64, xrp
        except NameError:
            pass
        # the cycle closures + spmv loop pin op_b (diagonals + mask) and
        # their compiled executables — drop them too (exec cannot delete
        # function locals; spell the dels out)
        try:
            del cyc_xla
        except NameError:
            pass
        try:
            del cyc_pal
        except NameError:
            pass
        try:
            del cyc_part
        except NameError:
            pass
        try:
            del cyc_blk
        except NameError:
            pass
        del spmv_loop, op_b, mult  # mult is a bound method: holds op_b
        # the kernel-stage DIA containers keep device diagonals alive
        # (A.dp + A.diags ~340 MB f32, A64.diags ~200 MB f64)
        try:
            del A, A64
        except NameError:
            pass
        try:
            del ds_loop  # partial over the f64-DS operator (~400 MB)
        except NameError:
            pass
        del stream_loop  # closure cell pins dp_cal past the local del
        del x, dp_cal
        import gc

        gc.collect()
        # cycle budget derived from the global deadline: keep ~700 s for
        # certification+polish (they run past budget_s), sinvert_tpu,
        # module timings and the closing samples
        budget = min(float(os.environ.get("BENCH_FLAGSHIP_BUDGET", "1500")),
                     _remaining() - 700.0)
        done_fs = False
        # descending ncv fallbacks: the shared chip's free memory swings
        # with other tenants; 64->48->40 rows = 5.4->4.1->3.4 GB bases
        ncv_env = int(os.environ.get("BENCH_FLAGSHIP_NCV", "48"))
        for ncv_try in dict.fromkeys((ncv_env, 48, 40, 32)):
            if done_fs:
                break
            try:
                _flagship(out, budget, _log, ncv=ncv_try)
                done_fs = True
            except Exception as e:
                _log(f"flagship (ncv={ncv_try}) failed: {e!r}")
                # shared-chip memory pressure is often transient: give
                # the other tenant a moment before the smaller retry
                if "RESOURCE_EXHAUSTED" in repr(e) and _remaining() > 900:
                    _log("flagship: waiting 45 s for chip memory...")
                    time.sleep(45)
            # collect OUTSIDE the except handler: the live traceback pins
            # the failed attempt's multi-GB basis until the handler exits
            gc.collect()
        _emit("flagship")

    # ---- device-side shift-invert: 1M-row GHEP, jitted CG inner solve
    # fused into the KS cycle (VERDICT r3 item 5) ----
    if on_tpu and os.environ.get("BENCH_SINVERT_TPU", "1") != "0" \
            and _remaining() > 180:
        for attempt in (0, 1):
            try:
                _sinvert_tpu(out, _log,
                             budget_s=min(600.0, _remaining() - 120.0))
                break
            except Exception as e:
                _log(f"sinvert_tpu failed: {e!r}")
                if (attempt == 0 and "RESOURCE_EXHAUSTED" in repr(e)
                        and _remaining() > 400):
                    time.sleep(45)
                else:
                    break
        import gc as _gc

        _gc.collect()
        _emit("sinvert_tpu")

    # ---- split-complex NHEP on TPU (VERDICT r4 item 3): complex
    # operator as two real planes, Arnoldi/KS cycles jitted on device ----
    if on_tpu and os.environ.get("BENCH_NHEP_TPU", "1") != "0" \
            and _remaining() > 150:
        for attempt in (0, 1):
            try:
                _nhep_split_tpu(out, _log)
                break
            except Exception as e:
                _log(f"nhep_split_tpu failed: {e!r}")
                if (attempt == 0 and "RESOURCE_EXHAUSTED" in repr(e)
                        and _remaining() > 300):
                    time.sleep(45)
                else:
                    break
        _emit("nhep_tpu")

    # ---- host-orchestrated module families: one TPU wall-clock +
    # dispatch-count sample each (NLEIGS, PEP-TOAR) so relay-latency
    # regressions become visible (VERDICT r3 item 7) ----
    if on_tpu and os.environ.get("BENCH_MODULES", "1") != "0" \
            and _remaining() > 150:
        try:
            _module_timings(out, _log)
        except Exception as e:
            _log(f"module timings failed: {e!r}")
        _emit("modules")

    # ---- third stream-bandwidth sample, after flagship/sinvert put the
    # process in a later time window (chip weather vs regression) ----
    if on_tpu and _remaining() > 30:
        try:
            bw3, dts3, sus3s = measure_stream()
            out["stream_bw_gb_s_3"] = bw3
            _log(f"stream window 3: {bw3:.0f} GB/s "
                 f"(window 1 was {out['stream_bw_gb_s']:.0f})")
        except Exception as e:
            _log(f"stream window-3 sample failed: {e!r}")
        _emit("stream3")

    # ---- k=10 smallest via shift-and-invert (host-factorization
    # workload, CPU backend — the axon plugin cannot host-callback) ----
    cpu = None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        pass
    if cpu is not None and _remaining() > 45:
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
            out["sinvert_rows"] = side3 * side3
            out["sinvert_nconv"] = int(eps3.nconv)
            out["sinvert_time_s"] = ks_dt
            out["sinvert_correct"] = bool(
                eps3.nconv >= 10 and np.allclose(got, exact3, rtol=1e-6))

    _log("done")
    _emit("done")


def _flagship(out, budget_s, _log, ncv=None):
    """k=20 smallest eigenpairs, 10.35M-row 3-D Laplacian, tol 1e-8.

    Default path: Chebyshev-amplified Krylov-Schur (eps/cheb_accel.py) —
    the plain thick-restart run needs tens of thousands of columns against
    the ~1e-5 relative gaps at the low end (round-3: 15,096 columns, 0
    converged) while the amplified run converges in a few hundred.
    BENCH_FLAGSHIP_CHEB=0 falls back to the plain cycle loop.
    """
    import jax
    import jax.numpy as jnp

    from slepc_tpu.eps.ks_jit import get_ks_hep_cycle
    from slepc_tpu.mat.generators import laplacian_3d_device, laplacian_3d_eigs

    t_start = time.perf_counter()
    nx, ny, nz = (int(s) for s in os.environ.get(
        "BENCH_FLAGSHIP_SIDES", "200,225,230").split(","))
    n = nx * ny * nz
    nev, tol = 20, 1e-8
    ncv = ncv or int(os.environ.get("BENCH_FLAGSHIP_NCV", "48"))
    if os.environ.get("BENCH_FLAGSHIP_CHEB", "1") != "0":
        return _flagship_cheb(out, budget_s, _log, nx, ny, nz, nev, tol, ncv)
    _log(f"flagship: {n/1e6:.2f}M rows 3-D Laplacian, k={nev}, tol={tol}, "
         f"ncv={ncv}, f64 double-single kernel")
    op = laplacian_3d_device(nx, ny, nz, dtype=np.float64)
    key = jax.random.PRNGKey(12345)
    vshape = op.mask2d.shape
    v0 = jax.random.normal(key, vshape, jnp.float64) * op.mask2d
    v0 = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((ncv + 1,) + vshape, jnp.float64).at[0].set(v0)
    H = jnp.zeros((ncv + 1, ncv), jnp.float64)
    # full CGS2: semi-orthogonal (partial/omega) Lanczos bounds the
    # backward error at sqrt(eps)*||A|| ~ 1.8e-7 absolute — relative to
    # lambda_1 ~ 6e-4 that is ~3e-4, far above the 1e-8 target, so the
    # light mode cannot certify this tolerance (measured: eigenvalues
    # exact to 2e-11 but true residuals 2e-4)
    cyc = get_ks_hep_cycle(op, key, ncv, "smallest", reorth="full",
                           donate=True)

    _log("flagship: compiling the f64 cycle (remote f64 compiles are "
         "slow — minutes)...")
    t0 = time.perf_counter()
    o = cyc(V, H, jnp.asarray(np.int32(0)), tol, 0)
    jax.block_until_ready(o[3])
    out["ks_tpu_compile_s"] = time.perf_counter() - t0
    _log(f"flagship: compile+first cycle {out['ks_tpu_compile_s']:.0f}s")

    V, H, j0, k2 = o[0], o[1], int(o[2]), int(o[3])
    t_solve0 = time.perf_counter()
    cols = ncv
    cycles = 1
    theta = o[4]
    while k2 < nev and cycles < 1000:
        if time.perf_counter() - t_start > budget_s:
            _log("flagship: wall budget hit")
            break
        cols += ncv - j0
        o = cyc(V, H, jnp.asarray(np.int32(j0)), tol, k2)
        V, H, j0, k2, theta = o[0], o[1], int(o[2]), int(o[3]), o[4]
        cycles += 1
        if cycles % 20 == 0:
            _log(f"flagship: cycle {cycles}, k2={k2}, cols={cols}, "
                 f"{time.perf_counter()-t_solve0:.0f}s")
    wall = time.perf_counter() - t_solve0
    kfound = min(k2, nev)
    out["ks_tpu_rows"] = n
    out["ks_tpu_nconv"] = int(k2)
    out["ks_tpu_cycles"] = cycles
    out["ks_tpu_cols"] = cols
    out["ks_tpu_solve_s"] = wall
    out["ks_tpu_eigenpairs_per_s"] = kfound / wall if wall > 0 else 0.0
    _log(f"flagship: k2={k2} in {cycles} cycles / {cols} cols / "
         f"{wall:.0f}s solve")
    if kfound > 0:
        # true residuals ON DEVICE (downloading 20 x 10M f64 vectors
        # through the relay would take minutes); eigenvalue check vs the
        # closed-form spectrum
        th = np.asarray(theta)[:kfound]

        @jax.jit
        def resid(op, V, th):  # op traced: big arrays must NOT become
            def one(i, acc):   # HLO constants (relay-upload pain)
                v = V[i]
                r = op.mult2d(v) - th[i] * v
                return acc.at[i].set(jnp.linalg.norm(r)
                                     / jnp.maximum(jnp.abs(th[i]), 1e-300))
            return jax.lax.fori_loop(0, kfound, one,
                                     jnp.zeros(kfound, jnp.float64))

        errs = np.asarray(resid(op, V, jnp.asarray(th)))
        exact = laplacian_3d_eigs(nx, ny, nz, k=nev)[:kfound]
        out["ks_tpu_max_resid"] = float(errs.max())
        out["ks_tpu_max_eig_abserr"] = float(
            np.abs(np.sort(th) - exact).max())
        out["ks_tpu_correct"] = bool(
            k2 >= nev and errs.max() < 100 * 1e-8
            and np.abs(np.sort(th) - exact).max() < 1e-9)
        _log(f"flagship: max true resid {errs.max():.2e}, max |eig err| "
             f"{out['ks_tpu_max_eig_abserr']:.2e}, "
             f"correct={out['ks_tpu_correct']}")


def _flagship_cheb(out, budget_s, _log, nx, ny, nz, nev, tol, ncv):
    """Chebyshev-amplified flagship: the north-star configuration."""
    import jax
    import numpy as np

    from slepc_tpu.eps.cheb_accel import ks_cheb_smallest
    from slepc_tpu.mat.generators import (laplacian_3d_device,
                                          laplacian_3d_eigs)

    n = nx * ny * nz
    degree = int(os.environ.get("BENCH_FLAGSHIP_DEG", "450"))
    _log(f"flagship: {n/1e6:.2f}M rows 3-D Laplacian, k={nev}, tol={tol}, "
         f"ncv={ncv}, cheb degree={degree}, f64 double-single kernel")
    op = laplacian_3d_device(nx, ny, nz, dtype=np.float64)

    # one timed DS-SpMV chain: the BASELINE orth-overhead gate
    # ("orth+restart <= 20% of iteration time") is evaluated on THIS
    # configuration, where the operator apply is the degree-d filtered
    # polynomial — overhead = cycle_col_time / (degree * spmv) - 1
    import jax as _jax
    import jax.numpy as _jnp

    @_jax.jit
    def _spmv_chain(opx, x, t):
        x = x * (1.0 + t)

        def body(i, v):
            y = opx.mult2d(v)
            return y / _jnp.linalg.norm(y)
        y = _jax.lax.fori_loop(0, 50, body, x)
        return y, _jnp.vdot(y.reshape(-1)[:8], y.reshape(-1)[:8]).real

    xs = _jax.random.normal(_jax.random.PRNGKey(1), op.mask2d.shape,
                            _jnp.float64) * op.mask2d
    dt_spmv, _sus = _timeit_chain(lambda x, t: _spmv_chain(op, x, t), xs, 50)
    out["ks_tpu_spmv_ms"] = dt_spmv * 1e3
    _log(f"flagship: f64-ds SpMV {dt_spmv*1e3:.2f} ms/apply")
    del xs

    t0 = time.perf_counter()
    # full CGS2 extension: the omega-monitored partial mode measured
    # SLOWER at scale (cond-pipelining stalls) and its correctly-scaled
    # drift monitor under-fires in the filter's huge dynamic range
    blk = int(os.environ.get("BENCH_FLAGSHIP_BLOCK", "1"))
    if blk > 1 and ncv % blk != 0:
        blk = 1
    reo = os.environ.get("BENCH_FLAGSHIP_REORTH", "full")
    if blk > 1:
        reo = "full"  # blocked path has its own BCGS2+SVQB^2 policy
    kd = int(os.environ.get("BENCH_FLAGSHIP_KEEPDEN", "3"))
    # rotate only the first nrot rows (rows past the restart keep count
    # are overwritten by the next extension): ncv=64/nrot=48 pays 3/4 of
    # the f64-emulated rotation while gaining 64-deep restarts
    nrt = int(os.environ.get("BENCH_FLAGSHIP_NROT", "40"))
    # restart rotation precision: 'ds' = the double-single Pallas
    # kernel (ops/rotate_pallas.py) — 5.5-17x the XLA f64-emulated
    # matmul in-process across windows (43 vs 242 ms steady-state at a
    # 48x40 rotation of a 0.81 GB basis; 33 vs 563 in a clean window)
    # at ~1.5e-14 per-restart error, validated through the lock-and-
    # adapt driver (tests/test_round5.py).  The 7x-faster mixed
    # (f32-planes) rotation stays REJECTED: its ~3e-7 noise floors the
    # filtered lock tolerance (2.1M validation: nconv 0, NaN windows);
    # DS sits 7 orders below that, at the basis' own DS-SpMV floor.
    # 'exact' (chunked f64-emulated matmul) remains the fallback knob.
    rmode = os.environ.get("BENCH_FLAGSHIP_ROT", "ds")
    out["ks_tpu_block"] = blk
    out["ks_tpu_reorth"] = reo
    out["ks_tpu_keep_den"] = kd
    out["ks_tpu_rot_mode"] = rmode
    out["ks_tpu_nrot"] = nrt
    res = ks_cheb_smallest(op, nev=nev, tol=tol, ncv=ncv, degree=degree,
                           key=jax.random.PRNGKey(12345),
                           budget_s=budget_s, block=blk, reorth=reo,
                           keep_den=kd, rot_mode=rmode, nrot=nrt,
                           m_extra=int(os.environ.get(
                               "BENCH_FLAGSHIP_MEXTRA", "12")),
                           log=lambda m: _log(f"flagship: {m}"))
    wall = time.perf_counter() - t0
    st = res["stats"]
    kfound = int(res["nconv"])
    out["ks_tpu_rows"] = n
    out["ks_tpu_nconv"] = kfound
    out["ks_tpu_cycles"] = st["cycles"]
    out["ks_tpu_cols"] = st["cols"]
    out["ks_tpu_solve_s"] = wall
    out["ks_tpu_eigenpairs_per_s"] = kfound / wall if wall > 0 else 0.0
    out["ks_tpu_cheb_degree"] = degree
    out["ks_tpu_cheb_lo"] = st["lo"]
    out["ks_tpu_cheb_adaptations"] = st["adaptations"]
    out["ks_tpu_probe_s"] = st["probe_s"]
    # orth+restart overhead on the flagship configuration: per-column
    # cycle time over the MEASURED filtered apply (cycles only —
    # probe/cert excluded via their recorded timings).  The r4 metric
    # used degree * bare-SpMV as the apply baseline, which omits the
    # Chebyshev recurrence's own axpy traffic (read t_{k-1} each step)
    # and so misattributed part of the apply to "orth overhead" — time
    # the actual degree-d polynomial apply instead.
    try:
        from slepc_tpu.st.cheb import ChebAmplifyOperator as _CAO

        bop_t = _CAO(op, st["lo"], st["hi"], degree)

        @_jax.jit
        def _filt_chain(bopx, x, t):
            x = x * (1.0 + t)

            def body(i, v):
                y = bopx.mult2d(v)
                return y / _jnp.linalg.norm(y)
            y = _jax.lax.fori_loop(0, 3, body, x)
            return y, _jnp.vdot(y.reshape(-1)[:8], y.reshape(-1)[:8]).real

        xs2 = _jax.random.normal(_jax.random.PRNGKey(9), op.mask2d.shape,
                                 _jnp.float64) * op.mask2d
        dt_filt, _sf = _timeit_chain(
            lambda x, t: _filt_chain(bop_t, x, t), xs2, 3)
        out["ks_tpu_filtered_apply_ms"] = dt_filt * 1e3
        _log(f"flagship: measured filtered apply "
             f"{dt_filt*1e3:.0f} ms (degree*spmv nominal "
             f"{degree*out.get('ks_tpu_spmv_ms', 0):.0f} ms)")
        del xs2, bop_t
    except Exception as e:
        _log(f"filtered-apply timing failed: {e!r}")
    if st["cols"] > 0 and out.get("ks_tpu_spmv_ms"):
        # exclude probe columns AND the compile-laden first cycle
        cyc_cols = st["cols"] - ncv - st.get("first_cycle_cols", 0)
        cyc_s = wall - st["probe_s"] - st.get("cert_s", 0.0) \
            - st.get("first_cycle_s", 0.0)
        if cyc_cols > 0 and cyc_s > 0:
            col_ms = cyc_s / cyc_cols * 1e3
            apply_ms = out.get("ks_tpu_filtered_apply_ms",
                               degree * out["ks_tpu_spmv_ms"])
            out["ks_tpu_col_ms"] = col_ms
            out["ks_tpu_orth_overhead"] = col_ms / apply_ms - 1.0
            out["ks_tpu_orth_overhead_nominal"] = \
                col_ms / (degree * out["ks_tpu_spmv_ms"]) - 1.0
            _log(f"flagship: {col_ms:.0f} ms/col vs {apply_ms:.0f} ms "
                 f"filtered apply -> orth+restart overhead "
                 f"{out['ks_tpu_orth_overhead']*100:.0f}% "
                 f"(nominal-baseline "
                 f"{out['ks_tpu_orth_overhead_nominal']*100:.0f}%)")
    th = np.asarray(res["lam"])[:kfound]
    errs = np.asarray(res["resid"])[:kfound]
    if kfound > 0:
        exact = laplacian_3d_eigs(nx, ny, nz, k=nev)[:kfound]
        out["ks_tpu_max_resid"] = float(errs.max())
        out["ks_tpu_max_eig_abserr"] = float(
            np.abs(np.sort(th) - exact).max())
        out["ks_tpu_correct"] = bool(
            kfound >= nev and errs.max() < 100 * tol
            and np.abs(np.sort(th) - exact).max() < 1e-9)
        _log(f"flagship: k={kfound} in {st['cycles']} cycles / "
             f"{st['cols']} cols / {wall:.0f}s; max resid {errs.max():.2e}, "
             f"max |eig err| {out['ks_tpu_max_eig_abserr']:.2e}, "
             f"correct={out['ks_tpu_correct']}")
    else:
        out["ks_tpu_correct"] = False
        _log(f"flagship: nothing converged in {wall:.0f}s")


def _nhep_split_tpu(out, _log):
    """1M-row complex tridiagonal NHEP on TPU via the split-complex
    (two-real-planes) Krylov path — the first genuinely complex family
    running on the TPU fast path (the axon PJRT rejects C64/C128).
    Correctness vs scipy.sparse.linalg.eigs on the same matrix."""
    import jax

    from slepc_tpu.eps.nhep_split import nhep_split_solve
    from slepc_tpu.ops.complex_split import SplitComplexDIAOperator

    t0 = time.perf_counter()
    n = 1 << 20
    rng = np.random.default_rng(5)
    th = np.linspace(0, 4 * np.pi, n)
    r = np.linspace(0.5, 2.0, n)
    d = (r * np.exp(1j * th)).astype(np.complex64)
    # detached top-magnitude outliers (3% gaps): the bulk spiral's
    # top-|lambda| spacing shrinks like 1/n, unresolvable in f32 at 1M
    kout = 8
    d[:kout] = (np.linspace(3.0, 2.4, kout)
                * np.exp(1j * np.linspace(0.3, 5.5, kout))
                ).astype(np.complex64)
    off = 0.05 * (rng.standard_normal(n)
                  + 1j * rng.standard_normal(n)).astype(np.complex64)
    lo = np.zeros(n, np.complex64)
    hi = np.zeros(n, np.complex64)
    hi[: n - 1] = off[: n - 1]
    lo[1:] = off[: n - 1] * 0.3
    nev, ncv, tol = 6, 32, 1e-4
    _log(f"nhep_tpu: {n/1e6:.2f}M-row complex tridiagonal, k={nev} "
         f"largest-magnitude, split-complex f32 planes")
    op = SplitComplexDIAOperator.from_complex_dia((-1, 0, 1),
                                                  np.stack([lo, d, hi]))
    out["nhep_tpu_padded"] = bool(op.padded)
    tc0 = time.perf_counter()
    res = nhep_split_solve(op, nev=nev, ncv=ncv, tol=tol,
                           key=jax.random.PRNGKey(2), max_cycles=120)
    wall = time.perf_counter() - t0
    out["nhep_tpu_rows"] = n
    out["nhep_tpu_nconv"] = int(res["nconv"])
    out["nhep_tpu_cycles"] = res["stats"]["cycles"]
    out["nhep_tpu_cols"] = res["stats"]["cols"]
    out["nhep_tpu_time_s"] = wall
    out["nhep_tpu_max_resid"] = float(np.max(res["resid"][:nev]))
    # host certification on the identical scipy matrix: residual of
    # every returned pair (deterministic; ARPACK set-matching is
    # ill-posed when the top-magnitude band is nearly degenerate)
    try:
        import scipy.sparse as sp

        A = sp.diags([lo[1:], d, hi[: n - 1]], [-1, 0, 1],
                     format="csr").astype(np.complex128)
        worst = 0.0
        for i in range(nev):
            lam = complex(res["lam"][i])
            x = op.unpad_split(np.asarray(res["V"][i]))
            r = float(np.linalg.norm(A @ x - lam * x)
                      / (abs(lam) * np.linalg.norm(x)))
            worst = max(worst, r)
        out["nhep_tpu_host_resid"] = worst
        out["nhep_tpu_eig_relerr"] = worst
        out["nhep_tpu_in_top_band"] = bool(all(
            abs(complex(res["lam"][i])) > 0.75 * float(np.abs(d).max())
            for i in range(nev)))
    except Exception as e:
        _log(f"nhep_tpu host reference failed: {e!r}")
        out["nhep_tpu_eig_relerr"] = float("nan")
    out["nhep_tpu_correct"] = bool(
        res["nconv"] >= nev
        and out["nhep_tpu_max_resid"] < 100 * tol
        and (np.isnan(out["nhep_tpu_eig_relerr"])
             or out["nhep_tpu_eig_relerr"] < 1e-2))
    _log(f"nhep_tpu: k2={res['nconv']} in {res['stats']['cycles']} cycles "
         f"/ {wall:.0f}s; max resid {out['nhep_tpu_max_resid']:.2e}, "
         f"eig relerr {out['nhep_tpu_eig_relerr']:.2e}, "
         f"correct={out['nhep_tpu_correct']}")


def _module_timings(out, _log):
    """Host-orchestrated solver families: NLEIGS on a 100k-row split-form
    delay problem, PEP-TOAR on a 250k-row quadratic.  These loops
    dispatch per step and solve projected problems on host — the numbers
    bound that cost (they are NOT fused fast paths).

    Runs in a SUBPROCESS on a fresh CPU-platform interpreter with a hard
    timeout: (a) both problems are complex-arithmetic and the axon PJRT
    rejects C128; (b) the in-process jax.default_device(cpu) dance under
    the axon platform was observed to HANG indefinitely (r5 rehearsal) —
    a stuck stage must never eat the bench deadline."""
    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import json, bench\n"
        "o = {}\n"
        "bench._module_timings_inproc(o, bench._log)\n"
        "print('MODOUT ' + json.dumps(o))\n")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=420, cwd=os.path.dirname(os.path.abspath(__file__)))
        for ln in r.stderr.splitlines()[-12:]:
            _log(f"modules| {ln}")
        for ln in r.stdout.splitlines():
            if ln.startswith("MODOUT "):
                out.update(json.loads(ln[len("MODOUT "):]))
                break
        else:
            _log(f"module timings: no result (rc={r.returncode})")
    except subprocess.TimeoutExpired:
        _log("module timings: subprocess timed out (420 s)")
    out.setdefault("modules_backend", "cpu subprocess")


def _module_timings_inproc(out, _log):
    import slepc_tpu as stt
    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.mat.linop import DIAOperator
    from slepc_tpu.sys import events

    out["modules_backend"] = "cpu subprocess (axon rejects C128)"
    _module_timings_body(out, _log, stt, laplacian_2d, DIAOperator,
                         events)


def _module_timings_body(out, _log, stt, laplacian_2d, DIAOperator,
                         events):
    import numpy as np

    # NEP / NLEIGS: 1-D delay problem  T(lam) = -lam I + A0 + e^-lam A1
    # (10k rows: ~40 s solo on CPU; the old 100k config never completed
    # inside any recorded bench)
    try:
        n = 10_000
        h = np.pi / (n + 1)
        main = np.full(n, -2.0 / (h * h))
        offd = np.zeros(n)
        offd[: n - 1] = 1.0 / (h * h)
        offl = np.zeros(n)
        offl[1:] = 1.0 / (h * h)
        A0 = DIAOperator((-1, 0, 1), np.stack([offl, main, offd]))
        xi = np.arange(1, n + 1) * h
        b = 4.1 - xi * (1 - np.exp(xi - np.pi))
        A1 = DIAOperator((0,), b[None, :])
        mI = DIAOperator((0,), -np.ones((1, n)))
        mats = [mI, A0, A1]
        fns = [stt.FNRational([1.0, 0.0]), stt.FNRational([1.0]),
               stt.FNExp()]
        fns[2].set_scale(-1.0)
        events.log_reset()
        events.log_begin()
        t0 = time.perf_counter()
        nep = stt.NEP(nev=2, solver="nleigs", target=-1.0, tol=1e-8)
        nep.set_split_operators(mats, fns)
        nep.set_rg(stt.RGEllipse(center=-1.0, radius=1.5, vscale=0.5))
        nep.solve()
        out["nleigs_tpu_rows"] = n
        out["nleigs_tpu_s"] = time.perf_counter() - t0
        out["nleigs_tpu_nconv"] = int(nep.nconv)
        out["nleigs_tpu_its"] = int(nep.its)
        out["nleigs_tpu_dispatches"] = int(sum(
            e["count"] for e in events._events.values())) \
            if getattr(events, "_events", None) else 0
        _log(f"nleigs_tpu: {out['nleigs_tpu_s']:.1f}s nconv={nep.nconv} "
             f"its={nep.its} events={out['nleigs_tpu_dispatches']}")
    except Exception as e:
        _log(f"nleigs timing failed: {e!r}")

    # PEP / TOAR: 90k-row damped quadratic (K + lam C + lam^2 M) x = 0
    try:
        side = 300
        n2 = side * side
        K = laplacian_2d(side, side, dtype=np.float64)
        tau = 0.1 + 0.05 * np.sin(np.arange(n2) * 1e-2)
        C = DIAOperator((0,), tau[None, :])
        M = DIAOperator((0,), np.ones((1, n2)))
        events.log_reset()
        events.log_begin()
        t0 = time.perf_counter()
        pep = stt.PEP([K, C, M], nev=3, solver="toar",
                      which="largest_magnitude", tol=1e-6)
        pep.solve()
        out["pep_toar_tpu_rows"] = n2
        out["pep_toar_tpu_s"] = time.perf_counter() - t0
        out["pep_toar_tpu_nconv"] = int(pep.nconv)
        out["pep_toar_tpu_its"] = int(pep.its)
        out["pep_toar_tpu_dispatches"] = int(sum(
            e["count"] for e in events._events.values())) \
            if getattr(events, "_events", None) else 0
        _log(f"pep_toar_tpu: {out['pep_toar_tpu_s']:.1f}s "
             f"nconv={pep.nconv} its={pep.its} "
             f"events={out['pep_toar_tpu_dispatches']}")
    except Exception as e:
        _log(f"pep timing failed: {e!r}")


def _sinvert_tpu(out, _log, budget_s=600.0):
    """1.06M-row GHEP (3-D Laplacian, diagonal SPD mass), sigma=0
    shift-invert with the jitted fixed-iteration CG inner solve — the
    whole restart cycle (extension + inner solves + projected eig) is one
    XLA program.  Eigen-quality certified by true residuals on device."""
    import jax
    import jax.numpy as jnp

    from slepc_tpu.eps.ks_jit import get_ks_hep_cycle
    from slepc_tpu.mat.generators import laplacian_3d_device
    from slepc_tpu.st.sinvert_jit import SinvertCGOperator

    t0 = time.perf_counter()
    nx, ny, nz = 100, 102, 104
    n = nx * ny * nz
    nev, tol, ncv = 10, 1e-8, 32
    iters = int(os.environ.get("BENCH_SINVERT_ITERS", "800"))
    _log(f"sinvert_tpu: {n/1e6:.2f}M-row GHEP, k={nev}, sigma=0, "
         f"CG iters={iters} (f64 double-single kernel)")
    Sop = laplacian_3d_device(nx, ny, nz, dtype=np.float64)
    bd = 1.0 + 0.5 * jnp.sin(jnp.arange(n, dtype=jnp.float64) * 1e-3)
    dhalf = Sop.pad2d(jnp.sqrt(bd))
    op = SinvertCGOperator(Sop, dhalf=dhalf, iters=iters, method="cg")

    key = jax.random.PRNGKey(4)
    vshape = op.mask2d.shape
    v0 = jax.random.normal(key, vshape, jnp.float64) * op.mask2d
    v0 = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((ncv + 1,) + vshape, jnp.float64).at[0].set(v0)
    H = jnp.zeros((ncv + 1, ncv), jnp.float64)
    cyc = get_ks_hep_cycle(op, key, ncv, "largest_magnitude",
                           reorth="full", donate=True)
    tc0 = time.perf_counter()
    o = cyc(V, H, jnp.asarray(np.int32(0)), tol, 0)
    jax.block_until_ready(o[3])
    out["sinvert_tpu_compile_s"] = time.perf_counter() - tc0
    _log(f"sinvert_tpu: compile+first cycle "
         f"{out['sinvert_tpu_compile_s']:.0f}s")
    V, H, j0, k2, theta = o[0], o[1], int(o[2]), int(o[3]), o[4]
    cycles, cols = 1, ncv
    while k2 < nev and cycles < 60:
        if time.perf_counter() - t0 > budget_s:
            _log("sinvert_tpu: budget hit")
            break
        cols += ncv - j0
        o = cyc(V, H, jnp.asarray(np.int32(j0)), tol, k2)
        V, H, j0, k2, theta = o[0], o[1], int(o[2]), int(o[3]), o[4]
        cycles += 1
    wall = time.perf_counter() - t0
    kf = min(k2, nev)
    th = np.asarray(theta)[:kf]
    lam = 1.0 / th  # sigma = 0
    out["sinvert_tpu_rows"] = n
    out["sinvert_tpu_nconv"] = int(k2)
    out["sinvert_tpu_cycles"] = cycles
    out["sinvert_tpu_cols"] = cols
    out["sinvert_tpu_time_s"] = wall
    if kf > 0:
        # true residuals ||A x - lam B x|| / |lam| on device,
        # x = D^{-1/2} u
        @jax.jit
        def resid(op, V, lam):
            def one(i, acc):
                x = op.postprocess_vec(V[i])
                r = op.Sop.mult2d(x) - lam[i] * (op.dhalf ** 2) * x
                return acc.at[i].set(
                    jnp.linalg.norm(r)
                    / (jnp.abs(lam[i]) * jnp.linalg.norm(x)))
            return jax.lax.fori_loop(0, kf, one,
                                     jnp.zeros(kf, jnp.float64))

        errs = np.asarray(resid(op, V, jnp.asarray(lam)))
        out["sinvert_tpu_max_resid"] = float(errs.max())
        out["sinvert_tpu_correct"] = bool(k2 >= nev
                                          and errs.max() < 100 * tol)
        _log(f"sinvert_tpu: k2={k2} in {cycles} cycles / {cols} cols / "
             f"{wall:.0f}s; max true resid {errs.max():.2e}, "
             f"correct={out['sinvert_tpu_correct']}")
    else:
        out["sinvert_tpu_correct"] = False


if __name__ == "__main__":
    main()
