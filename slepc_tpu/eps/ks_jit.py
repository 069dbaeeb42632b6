"""Fully-jitted Krylov-Schur cycle for Hermitian problems — the TPU fast path.

One restart cycle = ONE XLA program: basis extension (SpMV + fused CGS2 per
column), projected eigh, convergence count, rotation GEMM and H rebuild —
no host round-trip inside the cycle.  The host loop only reads back one
scalar (converged count) per restart.

Design notes (vs the general host-orchestrated loop in krylovschur.py):
  * the operator and PRNG key are TRACED jit arguments (round-3 A/B,
    tools/diag_r3.py on-TPU: traced-arg 44.3 ms/col vs closure-captured
    56.4 ms/col — and capturing embeds the diagonal arrays as HLO
    constants, which the remote-compile relay must upload at ~MB/s;
    a captured 1.1 GB basis broke the compile outright).
    ``get_ks_hep_cycle`` returns a convenience closure binding op/key
    over one module-level jitted implementation.
  * soft locking by construction: locked Ritz pairs stay in the projected
    matrix with zero residual coupling; the full ncv x ncv eigh re-produces
    them as unit-vector eigenpairs, so static shapes suffice — no
    dynamic-size active windows (the reference manages windows explicitly,
    krylovschur.c:249-332; XLA prefers the masked formulation).
  * restart: keep kl = k2 + (ncv - k2)/2 leading columns, arrow row
    beta * Q[last, :] — identical mathematics to the reference's
    thick-restart truncation (DSTruncate + BVMultInPlace).
  * everything shards over the "rows" mesh axis: the SpMV, the basis
    GEMMs, and the reductions (psum inserted by GSPMD).
  * the basis is stored TRANSPOSED, V^T with shape (ncv+1, n): the long
    axis n sits on the TPU lane dimension (multiple of 128), so the
    orthogonalization GEMVs stream at full HBM width.  The (n, ncv+1)
    column layout would put ncv+1 (e.g. 33) on the lane axis and pad it
    to 128 — a ~4x bandwidth tax on every dot/update.
  * on the padded 2-D f32 layout the CGS sweeps run as Pallas streaming
    kernels (ops/bv_pallas.py): dots / fused update+dots / update = 3
    basis reads per CGS2 column instead of 4 einsum passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jacobi_eigh import eigh_small


def _resolve_orth(op, orth: str) -> str:
    """'auto' -> pallas sweeps when the operator runs the padded-2-D f32
    fast path on a single device (sharded operators keep the einsum form
    that GSPMD partitions; f64/complex have no Mosaic kernels)."""
    if orth != "auto":
        return orth
    if hasattr(op, "mesh"):
        return "xla"
    if np.dtype(getattr(op, "dtype", np.float64)) != np.dtype(np.float32):
        return "xla"
    if not hasattr(op, "mult2d"):
        return "xla"
    return "pallas"


def get_ks_hep_cycle(op, key, ncv: int, which: str = "smallest",
                     passes: int = 2, reorth_period: int = 1,
                     reorth: str = "full", nsel: int = 0, orth: str = "auto",
                     donate: bool = False, keep_den: int = 2,
                     rot_mode: str = "exact", nrot: int = 0):
    """Restart cycle bound to ``op``; call as ``cycle(V, H, j0, tol,
    nlock=0)``.  The underlying jitted program caches on shapes/statics.
    donate=True reuses the V/H input buffers in place (production solve
    loops; the caller must not touch the passed-in V/H afterwards)."""
    orth = _resolve_orth(op, orth)

    def cycle(V, H, j0, tol, nlock=0):
        impl = _hep_cycle_impl_don if donate else _hep_cycle_impl
        return impl(op, V, H, j0, tol, key, jnp.asarray(nlock),
                    ncv=ncv, which=which, passes=passes,
                    reorth_period=reorth_period, reorth=reorth,
                    nsel=nsel, orth=orth, keep_den=keep_den,
                    rot_mode=rot_mode, nrot=nrot)

    return cycle


def ks_hep_cycle(op, V, H, j0, tol, key, ncv: int, which: str = "smallest",
                 passes: int = 2, reorth_period: int = 1,
                 reorth: str = "full", nlock=0, nsel: int = 0,
                 orth: str = "auto", keep_den: int = 2,
                 rot_mode: str = "exact", nrot: int = 0):
    """One Krylov-Schur(HEP) restart cycle.

    Args:
      op:  Hermitian LinearOperator (traced pytree argument).
      V:   (ncv+1, n) TRANSPOSED basis; rows [0, j0) orthonormal, row j0 =
           start vector (normalized).  See the layout note in the module
           docstring.
      H:   (ncv+1, ncv) projected coefficients (diag + arrow after restart).
      j0:  traced int — extension starts here.
      tol: relative tolerance.
      key: PRNG key for breakdown restarts.
      which: 'smallest' | 'largest' | 'largest_magnitude' (static).
    Returns:
      (V, H, j0_new, k2, theta, errest, beta)
        k2      — number of leading converged Ritz pairs
        theta   — (ncv,) Ritz values in wanted-first order
        errest  — (ncv,) residual-based error estimates (same order)
    """
    orth = _resolve_orth(op, orth)
    return _hep_cycle_impl(op, V, H, j0, tol, key, jnp.asarray(nlock),
                           ncv=ncv, which=which, passes=passes,
                           reorth_period=reorth_period, reorth=reorth,
                           nsel=nsel, orth=orth, keep_den=keep_den,
                           rot_mode=rot_mode, nrot=nrot)



_ROT_CHUNK_BYTES = 1 << 29  # rotate f64 bases larger than this in chunks


def _rotate_basis(Q, V, ncv: int):
    """V[:ncv] <- Q^T-combine of V[:ncv] (BVMultInPlace role).

    f64 on TPU is emulated: a plain dot_general materializes the split
    products as an (8, P, R, W) f32 temporary — 12.5 GB per temp at a
    10M-row ncv=40 basis (three of them OOMed a 16 GB chip, XLA dump in
    BENCH r3 notes).  Large f64 rotations therefore run CHUNKED over the
    row axis, bounding the emulation temporary to ~1 GB."""
    Qd = Q.astype(V.dtype)
    P = Qd.shape[1]  # output rows (may be < ncv: truncated rotation)
    big_f64 = (V.dtype == jnp.float64 and V.ndim == 3
               and V[:ncv].size * 8 > _ROT_CHUNK_BYTES)
    if not big_f64:
        return jnp.einsum("kp,k...->p...", Qd, V[:ncv])
    K, R, Wl = ncv, V.shape[1], V.shape[2]
    # chunk so the 8x-split f64 emulation temp stays ~<= 1 GB.  R need
    # not divide evenly: the last chunk's start clamps to R - rows_per,
    # re-computing a few overlapping rows with identical values (an
    # exact-division search walked rows_per negative for R = 2^a * 5
    # shapes — the round-3 flagship crash)
    rows_per = max(8, int(2 * _ROT_CHUNK_BYTES
                          // max(8 * K * Wl * 4, 1)) // 8 * 8)
    rows_per = min(rows_per, R)
    nch = -(-R // rows_per)
    out = jnp.zeros((P, R, Wl), V.dtype)

    def body(i, out):
        start = jnp.minimum(i * rows_per, R - rows_per)
        Vc = jax.lax.dynamic_slice_in_dim(V[:ncv], start, rows_per, axis=1)
        # dot_general per chunk: the f64 split products ride the MXU and
        # the emulation temp is bounded to ~1 GB by the chunking
        Oc = jnp.einsum("kp,krw->prw", Qd, Vc)
        return jax.lax.dynamic_update_slice_in_dim(out, Oc, start, axis=1)

    return jax.lax.fori_loop(0, nch, body, out)


def _rotate_basis_ds(Q, V, ncv: int):
    """rot_mode="ds": the restart rotation as a double-single Pallas
    kernel (ops/rotate_pallas.py) — all split products stay in VMEM, so
    none of the XLA f64-emulation (8, ...) HBM temporaries exist.
    ~1e-14 rel accuracy (vs ~1e-7 for the f32-plane modes — inside the
    tol_b=1e-13 locking floor).  Interpret mode on non-TPU backends
    keeps CPU tests on the identical code path."""
    from ..ops.rotate_pallas import rotate_basis_ds

    return rotate_basis_ds(Q.astype(V.dtype), V[:ncv],
                           interpret=jax.default_backend() != "tpu")


# ---- chunked panel primitives for LARGE f64 blocked cycles ------------
# Same motive as _rotate_basis: a dot_general on a multi-GB f64 operand
# materializes (8, ...) f32 split-product temporaries.  Each helper
# walks the padded row axis in chunks sized so the emulation temp stays
# ~<= 1 GB.  Reductions mask the clamped-overlap rows of the last chunk
# (re-reading them would double-count); updates rewrite them with
# identical values (idempotent).


def _panel_rows_per(m: int, Wl: int) -> int:
    rp = max(8, int(2 * _ROT_CHUNK_BYTES
                    // max(8 * m * Wl * 4, 1)) // 8 * 8)
    return rp


def _panel_dots_chunked(Vact, Wb):
    """(m, R, W) x (b, R, W) -> (m, b) row-chunked reduction."""
    m, R, Wl = Vact.shape
    b = Wb.shape[0]
    rows_per = min(_panel_rows_per(max(m, b), Wl), R)
    nch = -(-R // rows_per)

    def body(i, acc):
        start = i * rows_per
        s_cl = jnp.minimum(start, R - rows_per)
        Vc = jax.lax.dynamic_slice_in_dim(Vact, s_cl, rows_per, axis=1)
        Wc = jax.lax.dynamic_slice_in_dim(Wb, s_cl, rows_per, axis=1)
        valid = ((jnp.arange(rows_per) + s_cl) >= start)
        Wc = Wc * valid[None, :, None].astype(Wc.dtype)
        return acc + jnp.einsum("krw,mrw->km", Vc, Wc)

    return jax.lax.fori_loop(0, nch, body,
                             jnp.zeros((m, b), Vact.dtype))


def _panel_update_chunked(Vact, C, Wb):
    """Wb - C^T-combine(Vact), row-chunked: (b, R, W) out."""
    m, R, Wl = Vact.shape
    rows_per = min(_panel_rows_per(max(m, Wb.shape[0]), Wl), R)
    nch = -(-R // rows_per)

    def body(i, out):
        start = jnp.minimum(i * rows_per, R - rows_per)
        Vc = jax.lax.dynamic_slice_in_dim(Vact, start, rows_per, axis=1)
        Wc = jax.lax.dynamic_slice_in_dim(Wb, start, rows_per, axis=1)
        Oc = Wc - jnp.einsum("km,krw->mrw", C, Vc)
        return jax.lax.dynamic_update_slice_in_dim(out, Oc, start, axis=1)

    return jax.lax.fori_loop(0, nch, body, Wb)


def _panel_update_dots_chunked(Vact, C, Wb):
    """Fused (Wb - C^T V, V^H (Wb - C^T V)) in ONE pass over Vact —
    the chunk is read once and serves both the update and the new
    projection (the bandwidth contract of bv_pallas.panel_update_dots)."""
    m, R, Wl = Vact.shape
    b = Wb.shape[0]
    rows_per = min(_panel_rows_per(max(m, b), Wl), R)
    nch = -(-R // rows_per)

    def body(i, carry):
        out, acc = carry
        start = i * rows_per
        s_cl = jnp.minimum(start, R - rows_per)
        Vc = jax.lax.dynamic_slice_in_dim(Vact, s_cl, rows_per, axis=1)
        Wc = jax.lax.dynamic_slice_in_dim(Wb, s_cl, rows_per, axis=1)
        Oc = Wc - jnp.einsum("km,krw->mrw", C, Vc)
        valid = ((jnp.arange(rows_per) + s_cl) >= start)
        Om = Oc * valid[None, :, None].astype(Oc.dtype)
        acc = acc + jnp.einsum("krw,mrw->km", Vc, Om)
        out = jax.lax.dynamic_update_slice_in_dim(out, Oc, s_cl, axis=1)
        return out, acc

    out, acc = jax.lax.fori_loop(
        0, nch, body, (Wb, jnp.zeros((m, b), Vact.dtype)))
    return out, acc


def _panel_comb_chunked(M, Wb):
    """(i,j) combine of a (b, R, W) panel: out_i = sum_j M_ij Wb_j,
    row-chunked (the X2 = M @ Wb combine of the blocked SVQB)."""
    b, R, Wl = Wb.shape
    rows_per = min(_panel_rows_per(b, Wl), R)
    nch = -(-R // rows_per)

    def body(i, out):
        start = jnp.minimum(i * rows_per, R - rows_per)
        Wc = jax.lax.dynamic_slice_in_dim(Wb, start, rows_per, axis=1)
        Oc = jnp.einsum("ij,jrw->irw", M, Wc)
        return jax.lax.dynamic_update_slice_in_dim(out, Oc, start, axis=1)

    return jax.lax.fori_loop(0, nch, body, jnp.zeros_like(Wb))


def _rotate_basis_mixed(Q, V, ncv: int):
    """Mixed-precision restart rotation: hi/lo f32 planes x f32(Q) via
    two PRECISION-HIGHEST f32 MXU matmuls + the Q-tail term.

    The exact f64 rotation is bounded by XLA's f64 emulation (~8 f32
    split passes, measured 280-340 ms at a (48, 2.1M) basis); this runs
    7x faster at ~1.5e-7 relative error (f32 accumulation over ncv
    terms).  ONLY for drivers whose certification re-orthonormalizes and
    polishes on the original operator (eps/cheb_accel.py: CholQR2 +
    Rayleigh-Ritz + shifted-MINRES polish absorb per-restart basis noise
    far above this level — r4 pre-polish residuals were ~7e-8)."""
    from ..ops.dia_pallas import ds_split

    hp = jax.lax.Precision.HIGHEST
    Vh, Vl = ds_split(V[:ncv])
    Qh = Q.astype(jnp.float32)
    Ql = (Q - Qh.astype(jnp.float64)).astype(jnp.float32)
    Yh = jnp.einsum("kp,k...->p...", Qh, Vh, precision=hp)
    Yc = jnp.einsum("kp,k...->p...", Qh, Vl, precision=hp)
    Yq = jnp.einsum("kp,k...->p...", Ql, Vh, precision=hp)
    return (Yh.astype(jnp.float64) + Yc.astype(jnp.float64)
            + Yq.astype(jnp.float64))


def _rotate_basis_hybrid(Q, V, ncv: int, nlock):
    """Hybrid restart rotation: EXACT passthrough for the nlock locked
    rows, fast mixed-precision rotation for the active block.

    Locked columns of Q are replaced by exact identity columns (an f32
    matmul against an exact e_p column reproduces V_p BIT-EXACTLY from
    its hi/lo planes), and locked-row components of active columns are
    zeroed (they are O(eps) in exact arithmetic: locked rows carry zero
    coupling in H).  Active rows absorb the mixed rotation's ~3e-7 noise
    once per cycle but are re-Ritzed every cycle; a row's ONE noisy
    rotation happens at its locking cycle, after which it passes through
    exactly — no compounding across window adaptations (the failure mode
    that sank the all-mixed rotation)."""
    ar = jnp.arange(ncv)
    lockc = (ar < nlock)
    eye = jnp.eye(ncv, dtype=Q.dtype)
    Qe = jnp.where(lockc[None, :], eye,
                   jnp.where(lockc[:, None], jnp.zeros_like(Q), Q))
    return _rotate_basis_mixed(Qe, V, ncv)


def _hep_cycle_body(op, V, H, j0, tol, key, nlock, *, ncv: int, which: str,
                    passes: int, reorth_period: int, reorth: str, nsel: int,
                    orth: str, keep_den: int = 2, rot_mode: str = "exact",
                    nrot: int = 0):
    use_pallas = orth == "pallas"
    if use_pallas:
        from ..ops import bv_pallas as bvp

    if True:
        vshape = V.shape[1:]  # flat (n,) or padded 2-D (rows, W) — reshape
        # at the pallas boundary costs a tiled relayout copy, so the fast
        # path keeps vectors 2-D end to end; every op here is shape-generic
        rdtype = jnp.zeros((), V.dtype).real.dtype
        eps_mach = jnp.finfo(rdtype).eps
        opmult = getattr(op, "mult2d", None) if len(vshape) == 2 else None
        if opmult is None:
            opmult = op.mult
        opmask = getattr(op, "mask2d" if len(vshape) == 2 else "mask", None)

        pall = use_pallas and V.ndim == 3 and V.shape[2] == 512 \
            and V.shape[1] % 8 == 0 and V.dtype == jnp.float32

        # f64 on TPU is emulated: dot_general MATERIALIZES the f32
        # split-product cross terms as an (8, K, R, W) temporary (15 GB
        # at the 10M-row flagship -> compile OOM).  multiply+reduce
        # fuses without materialization and f64 has no MXU to lose.
        f64 = V.dtype == jnp.float64
        red_axes = tuple(range(1, V.ndim))

        def vdots(V, w):  # (ncv+1,) of <V_k, w>
            if f64:
                return jnp.sum(V.conj() * w[None], axis=red_axes)
            return jnp.einsum("k...,...->k", V.conj(), w)

        def vcomb(c, V):  # sum_k c_k V_k
            if f64:
                cb = c.reshape((-1,) + (1,) * (V.ndim - 1))
                return jnp.sum(cb * V, axis=0)
            return jnp.einsum("k,k...->...", c, V)

        def full_orth(V, w, mask):
            """CGS with `passes` sweeps; fused single-reduction semantics
            of bvorthog.c:91-132 (the reduction is free on one chip /
            one psum under GSPMD).  Unconditional sweeps by default: an
            in-graph IFNEEDED (lax.cond) refinement was measured SLOWER
            on TPU — the branch blocks XLA pipelining (33 vs 17.5 ms/col
            at 8.4M rows) even though it halves average bandwidth."""
            if pall:
                c = bvp.panel_dots(V, w[None])[:, 0] * mask
                c_tot = c
                wp = w[None]
                for _ in range(passes - 1):
                    wp, p = bvp.panel_update_dots(V, c[:, None], wp)
                    c = p[:, 0] * mask
                    c_tot = c_tot + c
                wp = bvp.panel_update(V, c[:, None], wp)
                return wp[0], c_tot
            c = vdots(V, w) * mask
            w = w - vcomb(c, V)
            c_tot = c
            for _ in range(passes - 1):
                c2 = vdots(V, w) * mask
                w = w - vcomb(c2, V)
                c_tot = c_tot + c2
            return w, c_tot

        def mk_restart(V, mask, j):
            """Breakdown -> deterministic random restart direction
            (krylovschur.c:298-307 role).  Called behind a cond: the
            orthogonalized random vector costs 2 full CGS sweeps and
            breakdown is exceptional."""
            rnd = jax.random.normal(jax.random.fold_in(key, j), vshape,
                                    rdtype).astype(V.dtype)
            if opmask is not None:
                rnd = rnd * opmask  # padded layouts: keep halo zero
            rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
            rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
            return rnd, jnp.linalg.norm(rnd)

        def finish_column(V, H, j, w, c_tot, mask):
            beta = jnp.linalg.norm(w)
            is_brk = beta < eps_mach ** 0.75 * (jnp.linalg.norm(c_tot)
                                                + eps_mach)
            w, beta_eff = jax.lax.cond(
                is_brk, lambda _: mk_restart(V, mask, j),
                lambda _: (w, beta), None)
            safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
            V = V.at[j + 1].set(w / safe)
            col = jnp.zeros((ncv + 1,), dtype=H.dtype)
            col = col.at[:ncv].set(c_tot[:ncv])
            col = jax.lax.dynamic_update_index_in_dim(
                col, jnp.where(is_brk, 0.0, beta).astype(H.dtype), j + 1, 0)
            H = H.at[:, j].set(col)
            return V, H

        # ---- extension: j0 -> ncv (fused-reduction CGS2 per column;
        # reorth_period > 1 = periodic reorthogonalization (the
        # reference's EPS_LANCZOS_REORTHOG_PERIODIC): three-term
        # recurrence between full sweeps.  EXPERIMENTAL: without the
        # omega drift monitor the basis loses orthogonality over many
        # restarts — reliable for few-restart runs only. ----
        def body(j, state):
            V, H = state
            w = opmult(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)

            if reorth_period > 1:
                def local_orth(w):
                    j0loc = jnp.maximum(j - 1, 0)
                    Vloc = jax.lax.dynamic_slice_in_dim(V, j0loc, 2, axis=0)
                    locmask = ((jnp.arange(2) + j0loc) < j + 1).astype(rdtype)
                    cl = jnp.einsum("k...,...->k", Vloc.conj(), w) * locmask
                    w = w - jnp.einsum("k,k...->...", cl, Vloc)
                    cl2 = jnp.einsum("k...,...->k", Vloc.conj(), w) * locmask
                    w = w - jnp.einsum("k,k...->...", cl2, Vloc)
                    c_tot = jnp.zeros(ncv + 1, dtype=V.dtype)
                    c_tot = jax.lax.dynamic_update_slice(c_tot, cl + cl2,
                                                         (j0loc,))
                    return w, c_tot

                w, c_tot = jax.lax.cond(
                    jnp.logical_or(j % reorth_period == 0, j == j0),
                    lambda w: full_orth(V, w, mask), local_orth, w)
            else:
                w, c_tot = full_orth(V, w, mask)
            return finish_column(V, H, j, w, c_tot, mask)

        # ---- partial (omega-recurrence) extension: Simon's drift
        # monitor.  Local 3-term orthogonalization per column; a full
        # CGS2 sweep fires only when the recurrence estimate of
        # max_k |v_{j+1}^H v_k| crosses the semi-orthogonality threshold
        # (sufficient for Ritz accuracy to eps*||A||, Simon 1984;
        # reference EPS_LANCZOS_REORTHOG_PARTIAL,
        # src/eps/impls/krylov/lanczos/lanczos.c update_omega()).  After
        # a trip, this column AND the next are fully reorthogonalized and
        # omega resets to eps level.
        def body_partial(j, state):
            V, H, om_prev, om_cur, force = state
            w = opmult(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)

            # local orth against v_{j-1}, v_j (always; CGS x2 on 2 cols)
            j0loc = jnp.maximum(j - 1, 0)
            Vloc = jax.lax.dynamic_slice_in_dim(V, j0loc, 2, axis=0)
            locmask = ((jnp.arange(2) + j0loc) < j + 1).astype(rdtype)
            cl = jnp.einsum("k...,...->k", Vloc.conj(), w) * locmask
            w = w - jnp.einsum("k,k...->...", cl, Vloc)
            cl2 = jnp.einsum("k...,...->k", Vloc.conj(), w) * locmask
            w = w - jnp.einsum("k,k...->...", cl2, Vloc)
            c_tot = jnp.zeros(ncv + 1, dtype=V.dtype)
            c_tot = jax.lax.dynamic_update_slice(c_tot, cl + cl2, (j0loc,))
            beta_loc = jnp.linalg.norm(w)

            # omega recurrence:  beta_j*om_{j+1,k} = beta_k*om_{j,k+1}
            #   + (alpha_k - alpha_j)*om_{j,k} + beta_{k-1}*om_{j,k-1}
            #   - beta_{j-1}*om_{j-1,k} + O(eps*||A||)
            alpha = jnp.real(H[jnp.arange(ncv), jnp.arange(ncv)])
            betav = jnp.real(H[jnp.arange(1, ncv + 1), jnp.arange(ncv)])
            alpha_j = jnp.real(c_tot[j])
            beta_jm1 = jnp.where(j > 0, betav[jnp.maximum(j - 1, 0)], 0.0)
            anorm = jnp.maximum(jnp.max(jnp.abs(alpha)), jnp.abs(alpha_j)) \
                + 2.0 * jnp.maximum(jnp.max(betav), beta_loc)
            bsafe = jnp.where(beta_loc > 0, beta_loc, 1.0)
            # roundoff term in OMEGA units (omega estimates |v^T v| <= 1):
            # the per-step perturbation eps*anorm enters the recurrence
            # BEFORE the division by beta, so its omega-contribution is
            # eps*anorm/beta.  The old unscaled eps*anorm blew up on
            # amplified operators (anorm ~ 1e43+ under a degree-400
            # Chebyshev filter): omega overflowed within tens of cycles,
            # inf-inf made it NaN, every NaN>thresh comparison went False
            # and the monitor silently stopped firing full sweeps.
            psi = eps_mach * anorm / bsafe
            om_up = jnp.concatenate([om_cur[1:], jnp.zeros(1, rdtype)])
            om_dn = jnp.concatenate([jnp.zeros(1, rdtype), om_cur[:-1]])
            alph = jnp.concatenate([alpha, jnp.zeros(1, rdtype)])
            betv = jnp.concatenate([betav, jnp.zeros(1, rdtype)])
            bet_dn = jnp.concatenate([jnp.zeros(1, rdtype), betav])
            om_next = (betv * om_up + (alph - alpha_j) * om_cur
                       + bet_dn * om_dn - beta_jm1 * om_prev) / bsafe
            # clamp at 1: |v^T v| cannot meaningfully exceed it, every
            # value above the trip threshold acts identically, and the
            # clamp cuts the overflow cascade
            om_next = jnp.minimum(jnp.abs(om_next) + psi, 1.0)
            kmask = (jnp.arange(ncv + 1) < j).astype(rdtype)
            om_next = om_next * kmask
            # v_j itself: locally orthogonalized -> eps level
            om_next = om_next.at[j].set(jnp.minimum(psi, 1.0))

            # trip threshold sqrt(eps)/sqrt(ncv): the restart rotation
            # V@Q amplifies pairwise drift by ~sqrt(ncv) in the typical
            # case, so keeping estimates below sqrt(eps)/sqrt(ncv) bounds
            # the rotated block at the semi-orthogonality level sqrt(eps)
            thresh = jnp.sqrt(eps_mach) / np.sqrt(ncv)
            tripped = jnp.max(om_next) > thresh
            need_full = jnp.logical_or(jnp.logical_or(tripped, force),
                                       j == j0)

            w, c_extra = jax.lax.cond(
                need_full, lambda w: full_orth(V, w, mask),
                lambda w: (w, jnp.zeros(ncv + 1, dtype=V.dtype)), w)
            c_tot = c_tot + c_extra
            # after a full sweep the NEW column is orthogonal to eps
            # level; om_cur (= drift of v_j, untouched by the sweep) must
            # NOT be reset — erasing it silences the monitor for the
            # restart block and lets unmonitored drift breed ghosts
            psi_c = jnp.minimum(psi, 1.0)
            om_next = jnp.where(need_full,
                                (psi_c * kmask).at[j].set(psi_c), om_next)

            V, H = finish_column(V, H, j, w, c_tot, mask)
            return V, H, om_cur, om_next, tripped

        # ---- selective reorthogonalization (Parlett-Scott; reference
        # EPS_LANCZOS_REORTHOG_SELECTIVE, lanczos.c): local 3-term
        # recurrence plus projection against the CONVERGED Ritz rows only
        # (after a Krylov-Schur restart the leading rows ARE Ritz
        # vectors).  Bandwidth per column = 2 local rows + nsel leading
        # rows instead of the whole basis.  ('delayed' reorthogonalization
        # exists in the reference to hide reduction LATENCY; the jitted
        # cycle already fuses its CGS reductions into one XLA program, so
        # that mode is subsumed by design and maps to 'full'.)
        def body_selective(j, state):
            V, H = state
            w = opmult(V[j])
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
            j0loc = jnp.maximum(j - 1, 0)
            Vloc = jax.lax.dynamic_slice_in_dim(V, j0loc, 2, axis=0)
            locmask = ((jnp.arange(2) + j0loc) < j + 1).astype(rdtype)
            Vsel = V[:nsel] if nsel else None

            def orth_pass(w):
                cl = jnp.einsum("k...,...->k", Vloc.conj(), w) * locmask
                w = w - jnp.einsum("k,k...->...", cl, Vloc)
                c = jnp.zeros(ncv + 1, dtype=V.dtype)
                c = jax.lax.dynamic_update_slice(c, cl, (j0loc,))
                if Vsel is not None:
                    smask = ((jnp.arange(nsel) < nlock)
                             & (jnp.arange(nsel) < j - 1)).astype(rdtype)
                    cs = jnp.einsum("k...,...->k", Vsel.conj(), w) * smask
                    w = w - jnp.einsum("k,k...->...", cs, Vsel)
                    c = c.at[:nsel].add(cs)
                return w, c

            w, c1 = orth_pass(w)
            w, c2 = orth_pass(w)
            return finish_column(V, H, j, w, c1 + c2, mask)

        if reorth == "selective" and nsel > 0:
            V, H = jax.lax.fori_loop(j0, ncv, body_selective, (V, H))
        elif reorth == "partial":
            # init = sqrt(eps): bound on the restarted block's pairwise
            # drift (~sqrt(ncv) x the maintained sqrt(eps)/sqrt(ncv) trip
            # level).  The contaminated rows only feed the first two
            # recurrence steps after j0 (three-term locality), so ~3 full
            # sweeps fire per restart and the remaining columns run at
            # local-orth cost.  Mixed-precision rotations inject ~1.5e-7
            # pairwise drift per restart — seed the monitor there so the
            # first columns trip full sweeps instead of trusting stale
            # rows.
            sq0 = float(np.sqrt(jnp.finfo(rdtype).eps))
            if rot_mode in ("mixed", "hybrid"):
                sq0 = max(sq0, 3e-7)
            om0 = jnp.full((ncv + 1,), sq0, rdtype)
            V, H, _, _, _ = jax.lax.fori_loop(
                j0, ncv, body_partial,
                (V, H, om0, om0, jnp.asarray(False)))
        else:
            V, H = jax.lax.fori_loop(j0, ncv, body, (V, H))
        beta = jnp.abs(H[ncv, ncv - 1])

        # ---- projected solve: full ncv x ncv eigh (replicated) ----
        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.conj().T)
        theta, Q = eigh_small(S)  # ascending
        if which == "largest":
            theta, Q = theta[::-1], Q[:, ::-1]
        elif which == "largest_magnitude":
            order = jnp.argsort(-jnp.abs(theta))
            theta, Q = theta[order], Q[:, order]

        # ---- convergence (leading consecutive) ----
        last = Q[ncv - 1, :]
        resid = beta * jnp.abs(last)
        errest = resid / jnp.maximum(jnp.abs(theta), 1e-300)
        conv = errest < tol
        if rot_mode == "hybrid":
            # locked rows carry their one-time rotation noise (~3e-7
            # relative coupling), which would break the leading-run
            # count forever; the caller's lock watermark is authoritative
            # for them, so force-count the locked block and let NEW locks
            # register at full precision behind it
            conv = jnp.logical_or(conv, jnp.arange(ncv) < nlock)
        # k2 = length of leading True run
        k2 = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))

        # ---- restart size ----
        # keep fraction = 1/keep_den (reference default 0.5, allowed
        # 0.1-0.9, krylovschur.c:122).  Aggressive truncation (keep_den
        # 3-4) amortizes the restart rotation — the dominant f64 cost at
        # flagship scale — over more new columns per cycle.
        # nrot (static, 0 = ncv) caps the ROTATED rows: rows past the
        # restart keep count are overwritten by the next extension and
        # need not be rotated at all — the f64-emulated rotation cost
        # scales with the output rows, so a 64-basis rotating 48 rows
        # pays 3/4 of the bytes.  k2/kl clamp under it (certification
        # fires at m_t < nrot long before the cap can bite).
        nro = nrot if (nrot and nrot < ncv) else ncv
        k2 = jnp.minimum(k2, nro - 1)
        l = jnp.maximum(1, (ncv - k2) // keep_den)
        l = jnp.minimum(l, jnp.maximum(ncv - k2 - 1, 0))
        kl = jnp.minimum(k2 + l, nro - 1)

        # ---- rotate and rebuild (BVMultInPlace + DSTruncate analog) ----
        # transposed layout: new rows = Q^T @ old rows (== columns V Q)
        f64r = V.dtype == jnp.float64 and not jnp.iscomplexobj(Q)
        if rot_mode == "hybrid" and f64r:
            Vrot = _rotate_basis_hybrid(Q, V, ncv, nlock)
            V = V.at[:ncv].set(Vrot)
        elif rot_mode == "mixed" and f64r:
            Vrot = _rotate_basis_mixed(Q, V, ncv)
            V = V.at[:ncv].set(Vrot)
        elif rot_mode == "ds" and f64r and V.ndim == 3:
            Vrot = _rotate_basis_ds(Q[:, :nro], V, ncv)
            V = V.at[:nro].set(Vrot)
        else:
            Vrot = _rotate_basis(Q[:, :nro], V, ncv)
            V = V.at[:nro].set(Vrot)
        vres = V[ncv]
        V = jax.lax.dynamic_update_index_in_dim(V, vres, kl, axis=0)
        keep = (jnp.arange(ncv) < kl).astype(H.dtype)
        Hnew = jnp.zeros_like(H)
        Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
            theta.astype(H.dtype) * keep)
        arrow = (beta * last).astype(H.dtype) * keep
        Hnew = jax.lax.dynamic_update_slice(Hnew, arrow[None, :], (kl, 0))

        return V, Hnew, kl, k2, theta, errest, beta


_STATICS = ("ncv", "which", "passes", "reorth_period", "reorth", "nsel",
            "orth", "keep_den", "rot_mode", "nrot")
# ---- split-cycle variant: extension chunks + finish as SEPARATE
# dispatches.  The axon TPU worker corrupts/drops programs whose single
# dispatch runs much past ~20 s (r4: a fused 40k-SpMV polish program
# crashed it; r5: a degree-450 x 48-column fused cycle returned NaN
# theta while the identical math at degree 300, ~13 s, was fine).  A
# high-degree filtered cycle therefore extends in chunks of a few
# columns per dispatch (each ~chunk*degree SpMVs) and runs the
# projected-solve/rotation as its own program; the host pays ~1 ms of
# relay latency per chunk — noise against multi-second chunks. ----


def _hep_extend_body(op, V, H, j0, jend, key, *, ncv: int, passes: int):
    """Extend columns [j0, jend) with full-CGS2 (the filtered driver's
    policy); mirror of _hep_cycle_body's extension stage."""
    vshape = V.shape[1:]
    rdtype = jnp.zeros((), V.dtype).real.dtype
    eps_mach = jnp.finfo(rdtype).eps
    opmult = getattr(op, "mult2d", None) if len(vshape) == 2 else None
    if opmult is None:
        opmult = op.mult
    opmask = getattr(op, "mask2d" if len(vshape) == 2 else "mask", None)
    f64 = V.dtype == jnp.float64
    red_axes = tuple(range(1, V.ndim))

    def vdots(V, w):
        if f64:
            return jnp.sum(V.conj() * w[None], axis=red_axes)
        return jnp.einsum("k...,...->k", V.conj(), w)

    def vcomb(c, V):
        if f64:
            cb = c.reshape((-1,) + (1,) * (V.ndim - 1))
            return jnp.sum(cb * V, axis=0)
        return jnp.einsum("k,k...->...", c, V)

    def body(j, state):
        V, H = state
        w = opmult(V[j])
        mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)
        c = vdots(V, w) * mask
        w = w - vcomb(c, V)
        c_tot = c
        for _ in range(passes - 1):
            c2 = vdots(V, w) * mask
            w = w - vcomb(c2, V)
            c_tot = c_tot + c2
        beta = jnp.linalg.norm(w)
        is_brk = beta < eps_mach ** 0.75 * (jnp.linalg.norm(c_tot)
                                            + eps_mach)

        def mk_restart(_):
            rnd = jax.random.normal(jax.random.fold_in(key, j), vshape,
                                    rdtype).astype(V.dtype)
            if opmask is not None:
                rnd = rnd * opmask
            rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
            rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
            return rnd, jnp.linalg.norm(rnd)

        w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                   lambda _: (w, beta), None)
        safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
        V = V.at[j + 1].set(w / safe)
        col = jnp.zeros((ncv + 1,), dtype=H.dtype).at[:ncv].set(
            c_tot[:ncv])
        col = jax.lax.dynamic_update_index_in_dim(
            col, jnp.where(is_brk, 0.0, beta).astype(H.dtype), j + 1, 0)
        H = H.at[:, j].set(col)
        return V, H

    V, H = jax.lax.fori_loop(j0, jend, body, (V, H))
    return V, H


def _hep_finish_body(V, H, tol, nlock, *, ncv: int, which: str,
                     keep_den: int = 2, rot_mode: str = "exact",
                     nrot: int = 0):
    """Projected solve + convergence + restart rotation — mirror of
    _hep_cycle_body's post-extension stage."""
    beta = jnp.abs(H[ncv, ncv - 1])
    S = H[:ncv, :ncv]
    S = 0.5 * (S + S.conj().T)
    theta, Q = eigh_small(S)
    if which == "largest":
        theta, Q = theta[::-1], Q[:, ::-1]
    elif which == "largest_magnitude":
        order = jnp.argsort(-jnp.abs(theta))
        theta, Q = theta[order], Q[:, order]
    last = Q[ncv - 1, :]
    resid = beta * jnp.abs(last)
    errest = resid / jnp.maximum(jnp.abs(theta), 1e-300)
    conv = errest < tol
    if rot_mode == "hybrid":
        conv = jnp.logical_or(conv, jnp.arange(ncv) < nlock)
    k2 = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))
    nro = nrot if (nrot and nrot < ncv) else ncv
    k2 = jnp.minimum(k2, nro - 1)
    l = jnp.maximum(1, (ncv - k2) // keep_den)
    l = jnp.minimum(l, jnp.maximum(ncv - k2 - 1, 0))
    kl = jnp.minimum(k2 + l, nro - 1)
    f64r = V.dtype == jnp.float64 and not jnp.iscomplexobj(Q)
    if rot_mode == "hybrid" and f64r:
        Vrot = _rotate_basis_hybrid(Q, V, ncv, nlock)
        V = V.at[:ncv].set(Vrot)
    elif rot_mode == "mixed" and f64r:
        Vrot = _rotate_basis_mixed(Q, V, ncv)
        V = V.at[:ncv].set(Vrot)
    elif rot_mode == "ds" and f64r and V.ndim == 3:
        Vrot = _rotate_basis_ds(Q[:, :nro], V, ncv)
        V = V.at[:nro].set(Vrot)
    else:
        Vrot = _rotate_basis(Q[:, :nro], V, ncv)
        V = V.at[:nro].set(Vrot)
    vres = V[ncv]
    V = jax.lax.dynamic_update_index_in_dim(V, vres, kl, axis=0)
    keep = (jnp.arange(ncv) < kl).astype(H.dtype)
    Hnew = jnp.zeros_like(H)
    Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
        theta.astype(H.dtype) * keep)
    arrow = (beta * last).astype(H.dtype) * keep
    Hnew = jax.lax.dynamic_update_slice(Hnew, arrow[None, :], (kl, 0))
    return V, Hnew, kl, k2, theta, errest, beta


def _hep_rotate_body(V, Q, kl, *, ncv: int, rot_mode: str = "exact"):
    """Restart rotation + residual-row move as its own device program
    (the split cycle's third dispatch; Q may have < ncv columns =
    truncated rotation)."""
    nro = Q.shape[1]
    if (rot_mode == "ds" and V.dtype == jnp.float64
            and not jnp.iscomplexobj(Q) and V.ndim == 3):
        Vrot = _rotate_basis_ds(Q, V, ncv)
    else:
        Vrot = _rotate_basis(Q, V, ncv)
    V = V.at[:nro].set(Vrot)
    vres = V[ncv]
    return jax.lax.dynamic_update_index_in_dim(V, vres, kl, axis=0)


_hep_rotate_impl_don = jax.jit(_hep_rotate_body,
                               static_argnames=("ncv", "rot_mode"),
                               donate_argnums=(0,))


_hep_extend_impl_don = jax.jit(_hep_extend_body,
                               static_argnames=("ncv", "passes"),
                               donate_argnums=(1, 2))
_hep_finish_impl_don = jax.jit(
    _hep_finish_body,
    static_argnames=("ncv", "which", "keep_den", "rot_mode", "nrot"),
    donate_argnums=(0, 1))


_hep_cycle_impl = jax.jit(_hep_cycle_body, static_argnames=_STATICS)
# donating variant for production solve loops: V/H buffers are reused
# in place, halving peak HBM (a 10M-row ncv=64 f64 basis is 5.4 GB; the
# non-donating cycle OOMed a 16 GB chip).  Callers must not reuse the
# V/H they passed in.
_hep_cycle_impl_don = jax.jit(_hep_cycle_body, static_argnames=_STATICS,
                              donate_argnums=(1, 2))


def get_ks_hep_cycle_blocked(op, key, ncv: int, b: int,
                             which: str = "smallest", orth: str = "auto",
                             donate: bool = False):
    """BLOCK restart cycle bound to ``op``; call as
    ``cycle(V, H, jb0, tol)``.  donate=True reuses the V/H buffers in
    place (production loops at flagship scale)."""
    orth = _resolve_orth(op, orth)

    def cycle(V, H, jb0, tol):
        impl = _hep_cycle_blocked_impl_don if donate \
            else _hep_cycle_blocked_impl
        return impl(op, V, H, jb0, tol, key, ncv=ncv,
                    b=b, which=which, orth=orth)

    return cycle


def ks_hep_cycle_blocked(op, V, H, jb0, tol, key, ncv: int, b: int,
                         which: str = "smallest", orth: str = "auto"):
    """One BLOCK Krylov-Schur(HEP) restart cycle — the bandwidth-lean path
    (compat wrapper over the cached closure factory).

    Thick-restart block Lanczos with block size b: per block step the basis
    is read THREE times total for all b new columns (branch-free BCGS2 with
    a fused update+dots kernel) instead of three times per column — the
    s-step/blocked reduction the BASELINE "orth+restart <= 20%" target
    demands (reference semantics: bvorthog.c:91 single-reduction CGS +
    bvorthog.c:492 block SVQB, composed into one extension).

    Intra-block orthonormalization is SVQB^2 (branch-free, truncation
    robust) computed Gram-side: the second pass's Gram matrix is formed
    from the first pass's small factors, so the big panel is combined
    only ONCE (W = B X with B = S^{1/2} exact, projected matrix stays
    exact).

    Layout: V (ncv+b, ...) transposed basis, ncv % b == 0; H (ncv+b, ncv)
    holds the full projected matrix plus the trailing block-coupling rows.
    jb0: traced block index — extension starts at rows [jb0*b, jb0*b+b)
    which must hold an orthonormal block (the restart residual block).

    Returns (V, H, jb_new, k2, theta, errest, beta).
    """
    orth = _resolve_orth(op, orth)
    return _hep_cycle_blocked_impl(op, V, H, jb0, tol, key, ncv=ncv, b=b,
                                   which=which, orth=orth)


def _hep_cycle_blocked_body(op, V, H, jb0, tol, key, *, ncv: int, b: int,
                            which: str, orth: str):
    assert ncv % b == 0
    nb = ncv // b
    use_pallas = orth == "pallas"
    if use_pallas:
        from ..ops import bv_pallas as bvp

    if True:
        vshape = V.shape[1:]
        rdtype = jnp.zeros((), V.dtype).real.dtype
        eps_mach = jnp.finfo(rdtype).eps
        opmult = getattr(op, "mult2d", None) if len(vshape) == 2 else None
        if opmult is None:
            opmult = op.mult
        # block SpMV: diagonals read once per b columns when available
        opmult_blk = getattr(op, "mult2d_block", None) \
            if len(vshape) == 2 else None
        opmask = getattr(op, "mask2d" if len(vshape) == 2 else "mask", None)

        pall = use_pallas and V.ndim == 3 and V.shape[2] == 512 \
            and V.shape[1] % 8 == 0 and V.dtype == jnp.float32
        # large f64 bases: route panel products through the row-chunked
        # helpers so the f64-emulation split temporaries stay ~<= 1 GB
        # (the flagship-scale failure mode of plain dot_general)
        f64big = (V.dtype == jnp.float64 and V.ndim == 3
                  and V.size * 8 > _ROT_CHUNK_BYTES)

        def pdots(Vact, Wb):  # (m, b) of <V_k, W_i>
            if pall:
                return bvp.panel_dots(Vact, Wb)
            if f64big:
                return _panel_dots_chunked(Vact, Wb)
            return jnp.einsum("k...,m...->km", Vact.conj(), Wb)

        def pupdate(Vact, C, Wb):  # Wb - C^T-combine(Vact)
            if pall:
                return bvp.panel_update(Vact, C, Wb)
            if f64big:
                return _panel_update_chunked(Vact, C, Wb)
            return Wb - jnp.einsum("km,k...->m...", C, Vact)

        def pupdate_dots(Vact, C, Wb):
            if pall:
                return bvp.panel_update_dots(Vact, C, Wb)
            if f64big:
                return _panel_update_dots_chunked(Vact, C, Wb)
            W1 = Wb - jnp.einsum("km,k...->m...", C, Vact)
            return W1, jnp.einsum("k...,m...->km", Vact.conj(), W1)

        def svqb_factors(lam, U):
            """Clamped SVQB factors from a precomputed eigendecomposition:
            (inv_half, half) with X = inv_half @ W orthonormal-ish and
            W = half @ X."""
            lam_max = jnp.maximum(lam[-1], eps_mach)
            lam_c = jnp.maximum(lam, eps_mach ** 2 * lam_max)
            inv_half = (U * (lam_c ** -0.5)[None, :]) @ U.conj().T
            half = (U * (lam_c ** 0.5)[None, :]) @ U.conj().T
            return inv_half, half

        def svqb_gram(G):
            return svqb_factors(*eigh_small(0.5 * (G + G.conj().T)))

        def step(p, V, H, key):
            """One block step at STATIC block index p: every basis read
            is a static prefix slice V[: (p+1)*b], so the panel traffic
            tracks the actual fill instead of the full allocation.
            Branch-free BCGS2: dots, fused update+dots, update — 3 prefix
            reads per b columns."""
            m = (p + 1) * b
            Vact = V[:m]
            X = V[p * b: m]
            Wb = opmult_blk(X) if opmult_blk is not None \
                else jax.vmap(opmult)(X)
            C1 = pdots(Vact, Wb)
            Wb, C2 = pupdate_dots(Vact, C1, Wb)
            Wb = pupdate(Vact, C2, Wb)
            C = C1 + C2
            # soft breakdown: near-rank-deficient block -> mix in fresh
            # random directions, re-orthogonalize (rare; behind a cond).
            # ONE eigh serves both the breakdown check (lam_min) and the
            # first SVQB factor (was a separate eigh per step).
            G = pdots(Wb, Wb)
            G = 0.5 * (G + G.conj().T)
            lamG, UG = eigh_small(G)
            scale = jnp.maximum(jnp.linalg.norm(C), 1.0)
            is_brk = lamG[0].real < (eps_mach * scale) ** 2

            def refresh(args):
                Wb, key, _, _, _ = args
                key, sub = jax.random.split(key)
                rnd = jax.random.normal(sub, (b,) + vshape,
                                        rdtype).astype(V.dtype)
                if opmask is not None:
                    rnd = rnd * opmask
                Wb = Wb + eps_mach ** 0.5 * scale * rnd
                for _ in range(2):
                    Cr = pdots(Vact, Wb)
                    Wb = pupdate(Vact, Cr, Wb)
                Gr = pdots(Wb, Wb)
                Gr = 0.5 * (Gr + Gr.conj().T)
                lamr, Ur = eigh_small(Gr)
                return Wb, key, Gr, lamr, Ur

            Wb, key, G, lamG, UG = jax.lax.cond(
                is_brk, refresh, lambda a: a, (Wb, key, G, lamG, UG))
            # SVQB^2 computed Gram-side: G1 = inv1 G inv1 is the Gram of
            # X1 = inv1 Wb, so the second factor needs no second panel
            # combine; X2 = (inv2 inv1) Wb in ONE combine, Wb = B X2 with
            # B = half1 half2 exact.
            inv1, half1 = svqb_factors(lamG, UG)
            G1 = inv1 @ G @ inv1
            inv2, half2 = svqb_gram(G1)
            M = (inv2 @ inv1).astype(V.dtype)
            Bmat = (half1 @ half2).astype(V.dtype)
            X2 = _panel_comb_chunked(M, Wb) if f64big \
                else jnp.einsum("ij,j...->i...", M, Wb)
            V = V.at[m: m + b].set(X2)
            # H block column: projection coeffs + sub-block coupling
            col = jnp.zeros((ncv + b, b), dtype=H.dtype)
            col = col.at[:m].set(C.astype(H.dtype))
            col = col.at[m: m + b].set(Bmat)
            H = H.at[:, p * b: m].set(col)
            return V, H, key

        # static unroll with a cond-skip below the traced restart fill
        # level: skipped steps execute the identity branch only (no basis
        # traffic)
        rkey = key
        for p in range(nb):
            V, H, rkey = jax.lax.cond(
                p >= jb0,
                lambda VHk, p=p: step(p, *VHk),
                lambda VHk: VHk,
                (V, H, rkey))

        # ---- projected solve ----
        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.conj().T)
        theta, Q = eigh_small(S)
        if which == "largest":
            theta, Q = theta[::-1], Q[:, ::-1]
        elif which == "largest_magnitude":
            order = jnp.argsort(-jnp.abs(theta))
            theta, Q = theta[order], Q[:, order]

        # ---- convergence: residual = ||B_last @ q_lastblock|| ----
        Blast = H[ncv: ncv + b, ncv - b: ncv]
        Rq = Blast @ Q[ncv - b:, :]
        resid = jnp.linalg.norm(Rq, axis=0)
        errest = resid / jnp.maximum(jnp.abs(theta), 1e-300)
        conv = errest < tol
        k2 = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))

        # ---- restart: keep kl rows, block aligned ----
        l = jnp.maximum(1, (ncv - k2) // 2)
        kl = k2 + l
        kl = jnp.minimum((kl + b - 1) // b * b, ncv - b)
        kl = jnp.maximum(kl, b)

        Vrot = _rotate_basis(Q, V, ncv)
        V = V.at[:ncv].set(Vrot)
        Xres = jax.lax.dynamic_slice_in_dim(V, ncv, b, axis=0)
        V = jax.lax.dynamic_update_slice_in_dim(V, Xres, kl, axis=0)
        keep = (jnp.arange(ncv) < kl).astype(H.dtype)
        Hnew = jnp.zeros_like(H)
        Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
            theta.astype(H.dtype) * keep)
        arrow = (Blast @ Q[ncv - b:, :]).astype(H.dtype) * keep[None, :]
        Hnew = jax.lax.dynamic_update_slice(Hnew, arrow, (kl, 0))

        beta = jnp.linalg.norm(Blast)
        return V, Hnew, kl // b, k2, theta, errest, beta


_BLK_STATICS = ("ncv", "b", "which", "orth")
_hep_cycle_blocked_impl = jax.jit(_hep_cycle_blocked_body,
                                  static_argnames=_BLK_STATICS)
# donating variant: V/H reused in place (flagship-scale bases)
_hep_cycle_blocked_impl_don = jax.jit(_hep_cycle_blocked_body,
                                      static_argnames=_BLK_STATICS,
                                      donate_argnums=(1, 2))


def _prepare_fast_operator(eps, op, dtype):
    """Route an operator to its fastest TPU form (padded Pallas DIA /
    double-single f64 DIA / hybrid ELL / sharded halo variants).
    Returns (op, padded_or_None, n_flat)."""
    n = eps.n
    padded = None
    if hasattr(op, "n_pad") and hasattr(op, "pad2d"):
        # already a padded-layout operator (device shift-invert tier,
        # pre-built Pallas operators): it is its own fast form
        return op, op, op.n_pad
    from ..mat.linop import DIAOperator
    from ..sys.mesh import ROWS, get_mesh

    mesh = get_mesh()
    if (isinstance(op, DIAOperator) and mesh is not None
            and mesh.shape.get(ROWS, 1) > 1
            and (jax.default_backend() != "tpu"
                 or dtype == np.dtype(np.float32))):
        # multi-device: the Pallas padded kernel under shard_map with
        # ppermute boundary-row halo (parallel/halo_pallas.py)
        from ..parallel.halo_pallas import ShardedDIAPaddedOperator

        try:
            padded = ShardedDIAPaddedOperator.from_dia(op, mesh)
            op = padded
            n = padded.n_pad
        except ValueError:
            padded = None
    if padded is None and isinstance(op, DIAOperator) and op.dp is not None:
        from ..ops.dia_pallas import DIAPaddedOperator

        padded = DIAPaddedOperator.from_dia(op)
        op = padded
        n = padded.n_pad
    if (padded is None and isinstance(op, DIAOperator)
            and dtype == np.dtype(np.float64)
            and jax.default_backend() == "tpu"):
        # f64 fast path: double-single (two-f32) Pallas kernel — remote
        # f64 Mosaic compiles crash, compensated f32 reaches ~2e-15
        from ..ops.dia_pallas import DIAPaddedOperatorDS, dia_spmv_supported

        if dia_spmv_supported(op.offsets, op.shape[0], np.float32):
            padded = DIAPaddedOperatorDS.from_dia(op)
            op = padded
            n = padded.n_pad
    from ..mat.linop import AIJOperator

    if (padded is None and isinstance(op, AIJOperator)
            and mesh is not None and mesh.shape.get(ROWS, 1) > 1
            and (jax.default_backend() != "tpu"
                 or dtype == np.dtype(np.float32))
            and op.shape[0] >= 4096):
        # multi-device general sparsity: hybrid ELL under shard_map with
        # ppermute boundary-row halo (parallel/halo_pallas.py)
        from ..parallel.halo_pallas import ShardedGELLPaddedOperator

        try:
            padded = ShardedGELLPaddedOperator.from_aij(op, mesh)
            op = padded
            n = padded.n_pad
        except (ValueError, AssertionError):
            padded = None
    if (padded is None and isinstance(op, AIJOperator)
            and (jax.default_backend() != "tpu"
                 or dtype == np.dtype(np.float32))
            and op.shape[0] >= 4096):
        # general sparsity: hybrid diagonal/gather ELL Pallas kernel
        # (ops/ell_pallas.py); packing cached on the operator
        g = op.to_gell()
        if g is not None:
            padded = g
            op = padded
            n = padded.n_pad
    return op, padded, n


def ks_hep_solve(eps, op, which: str, Bip=None) -> bool:
    """Host driver for the jitted cycle; fills the EPS result fields.

    Returns True when this fast path applies and ran (standard Hermitian,
    identity metric); False to fall back to the general loop.
    """
    if Bip is not None:
        return False
    ncv = eps.ncv
    dtype = np.dtype(eps.A.dtype)
    op, padded, n = _prepare_fast_operator(eps, op, dtype)

    # Chebyshev-amplified smallest-end path (eps.cheb_degree > 0): the
    # monotone low-end filter turns badly-separated smallest eigenvalues
    # into well-separated largest ones (eps/cheb_accel.py; STFILTER seat)
    cheb_deg = int(getattr(eps, "cheb_degree", 0) or 0)
    if (cheb_deg > 0 and which == "smallest"
            and not getattr(eps.st, "requires_rayleigh", False)
            and not np.issubdtype(dtype, np.complexfloating)):
        from .cheb_accel import ks_cheb_smallest

        cheb_blk = int(getattr(eps, "cheb_block", 1) or 1)
        if cheb_blk > 1:
            ncv = -(-ncv // cheb_blk) * cheb_blk  # block-aligned basis
        res = ks_cheb_smallest(
            op, nev=eps.nev, tol=eps.tol, ncv=ncv, degree=cheb_deg,
            block=cheb_blk,
            reorth=getattr(eps, "cheb_reorth", "full"),
            rot_mode=getattr(eps, "cheb_rot_mode", "exact"),
            keep_den=int(getattr(eps, "cheb_keep_den", 2) or 2),
            budget_s=getattr(eps, "cheb_budget_s", None))
        k = int(res["nconv"])
        eps.nconv = k
        eps.its = res["stats"]["cycles"]
        eps.eigenvalues = np.array(res["lam"][:k], copy=True)
        eps.errests = np.array(res["resid"][:k], copy=True)
        X = res["X"]
        if padded is not None:
            cols = [np.asarray(padded.unpad(X[i])) for i in range(k)]
            Xh = np.stack(cols, axis=1) if k else np.zeros((eps.n, 0))
        else:
            Xh = np.asarray(X[:k]).T
        eps._eigenvectors = Xh
        eps.V = None
        return True
    bsize = int(getattr(eps, "block_size", 1) or 1)
    if bsize > 1:
        ncv = -(-ncv // bsize) * bsize  # block-aligned basis
    nrow0 = bsize if bsize > 1 else 1

    def _init_rows(nrows):
        """nrows starting vectors: initial space columns then random,
        orthonormalized on host (tiny QR)."""
        rng0 = np.random.default_rng(0)
        cols = []
        if eps.initial_space is not None:
            for j in range(min(eps.initial_space.shape[1], nrows)):
                cols.append(np.asarray(eps.initial_space[:, j]))
        while len(cols) < nrows:
            c = rng0.standard_normal(eps.n)
            if np.issubdtype(dtype, np.complexfloating):
                c = c + 1j * rng0.standard_normal(eps.n)
            cols.append(c)
        M = np.stack(cols, axis=1).astype(dtype)
        if padded is not None:
            M = np.stack([np.asarray(padded.pad(jnp.asarray(M[:, j])))
                          for j in range(nrows)], axis=1)
        Qm, _ = np.linalg.qr(M)
        return Qm.T.astype(dtype)  # (nrows, n_flat)

    rows0 = _init_rows(nrow0)
    if padded is not None:
        vshape = np.asarray(padded.pad2d(np.zeros(eps.n, dtype))).shape
        V = jnp.zeros((ncv + nrow0,) + vshape, dtype=dtype)
        for i in range(nrow0):
            V = V.at[i].set(jnp.asarray(rows0[i].reshape(vshape)))
        if hasattr(padded, "mesh"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..sys.mesh import ROWS

            V = jax.device_put(
                V, NamedSharding(padded.mesh, P(None, ROWS, None)))
    else:
        from ..sys.mesh import device_put_basis_t

        V = jnp.zeros((ncv + nrow0, n), dtype=dtype)
        for i in range(nrow0):
            V = V.at[i].set(jnp.asarray(rows0[i]))
        V = device_put_basis_t(V)
    H = jnp.zeros((ncv + nrow0, ncv), dtype=dtype)
    key = jax.random.PRNGKey(12345)

    filtered = getattr(eps.st, "requires_rayleigh", False)
    j0 = jnp.asarray(0)
    k2 = 0
    theta = errest = None
    from ..sys.events import log_event

    if bsize > 1:
        cycle_fn = get_ks_hep_cycle_blocked(op, key, ncv, bsize, which)
    else:
        rmode = getattr(eps, "reorth", "full")
        if rmode == "delayed":  # latency motive subsumed by the
            rmode = "full"      # fused-reduction jitted cycle
        if rmode in ("selective", "periodic"):
            # Parlett-Scott selective and unmonitored periodic belong to
            # the explicit Lanczos solver (eps/explicit.py); KS's safe
            # light policy is the omega-monitored partial mode (a fixed
            # period with no drift monitor loses orthogonality over many
            # restarts — round-1 finding)
            rmode = "partial"
        cycle_fn = get_ks_hep_cycle(
            op, key, ncv, which,
            reorth_period=getattr(eps, "reorth_period", 1), reorth=rmode,
            # eps.rot_mode="ds" routes f64 padded restarts through the
            # double-single Pallas rotation (ops/rotate_pallas.py)
            rot_mode=getattr(eps, "rot_mode", "exact"))

    while eps.its < eps.max_it:
        eps.its += 1
        nnz_op = getattr(op, "nnz", 2 * n)
        with log_event("EPS_KSCycle_jit",
                       flops=ncv * (2.0 * nnz_op + 8.0 * n * ncv)):
            if bsize > 1:
                V, H, j0, k2j, theta, errest, beta = cycle_fn(
                    V, H, j0, eps.tol)
            else:
                V, H, j0, k2j, theta, errest, beta = cycle_fn(
                    V, H, j0, eps.tol, jnp.asarray(k2))
            k2 = int(k2j)
            # hand j0 across cycles as a FRESH host scalar: feeding the
            # previous cycle's device scalar back in makes the identical
            # executable ~3x slower (measured on both CPU and TPU,
            # tools/diag_tail.py — same value, same compiled program;
            # the host already syncs on k2 so this costs nothing extra)
            j0 = jnp.asarray(np.int32(int(j0)))
        if len(eps.monitor):
            eps.monitor(eps, eps.its, k2, np.asarray(theta),
                        np.asarray(errest))
        if eps.stopping is not None and eps.stopping(eps, eps.its, k2,
                                                     eps.nev):
            break
        if filtered:
            # count converged pairs on the filter plateau (p(lambda) ~ 1):
            # out-of-interval neighbors converge too but don't count
            th = np.asarray(theta)[:k2]
            if int(np.sum(th > 0.5)) >= eps.nev or k2 >= ncv - 1:
                break
        elif k2 >= eps.nev:
            break
    eps.nconv = k2
    theta = np.asarray(theta)
    errest = np.asarray(errest)
    st = eps.st
    lam = st.back_transform(theta[:k2].astype(complex))
    if padded is not None and k2 > 0:
        # transformed-space -> original-space vectors (e.g. the device
        # shift-invert symmetrization's x = D^{-1/2} u)
        post = getattr(padded, "postprocess_vec", None)
        cols = [np.asarray(padded.unpad(post(V[i]) if post else V[i]))
                for i in range(k2)]
        X = np.stack(cols, axis=1)
        nrmX = np.linalg.norm(X, axis=0)
        nrmX[nrmX == 0] = 1
        X = X / nrmX
    else:
        X = np.asarray(V[:k2]).T
    if getattr(st, "requires_rayleigh", False) and k2 > 0:
        from .krylovschur import _rayleigh_values

        lam = _rayleigh_values(eps, X)
        # true residuals on the ORIGINAL operator (the filtered-space
        # residual says nothing about A), and restrict to the interval
        Xj = jnp.asarray(X)
        Rtrue = eps.A.mult(Xj) - Xj * jnp.asarray(lam.real,
                                                  dtype=Xj.dtype)[None, :]
        res = np.asarray(jnp.linalg.norm(Rtrue, axis=0))
        errs = res / np.maximum(np.abs(lam.real), 1e-300)
        a_i, b_i = getattr(st, "interval", (-np.inf, np.inf))
        sel = (lam.real >= a_i) & (lam.real <= b_i) \
            & (errs < max(eps.tol * 100, 1e-6))
        lam, X, errs = lam[sel], X[:, sel], errs[sel]
        order = np.argsort(lam.real)
        lam, X = lam[order], X[:, order]
        k2 = len(lam)
        eps.nconv = k2
        errest = np.zeros(max(k2, 1))
        errest[:k2] = errs[order]
    eps.eigenvalues = np.real_if_close(lam)
    if np.all(np.abs(np.imag(lam)) < 1e-13):
        eps.eigenvalues = np.real(lam)
    eps.errests = errest[:k2].copy()
    eps._eigenvectors = X
    eps.V = None
    return True
