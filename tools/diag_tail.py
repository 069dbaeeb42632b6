"""Bisect the restart TAIL of ks_hep_cycle: every loop-body ingredient
measures fast in isolation (diag_body D: 7.3 ms/col; diag_ext2 E with
eigh+rotation: 8.0 ms/col) while the full library cycle measures ~44 —
the remaining deltas are the kl-dependent dynamic updates, the Hnew
rebuild, and the 7-tuple output.  Replica probes (chained, varying
inputs, steady j0=16):

  R_full      exact replica of the library cycle (sanity: ~library time)
  R_statickl  kl pinned to a static 24 (k2 ignored)
  R_novres    no vres dynamic row placement
  R_noHnew    H returned untouched (no rebuild/arrow)
  R_fewout    return (V, H, kl) only
  LIB         the library _hep_cycle_impl for reference
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
    import jax.numpy as jnp

    if os.environ.get("DIAG_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator
    from slepc_tpu.ops.jacobi_eigh import eigh_small

    side = int(os.environ.get("DIAG_SIDE", "2896"))
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    ncv = 32
    ncols = 16
    rng = np.random.default_rng(0)
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    key = jax.random.PRNGKey(0)
    eps_mach = jnp.finfo(np.float32).eps
    opmask = op.mask2d
    rdtype = jnp.float32

    def vdots(V, w):
        return jnp.einsum("k...,...->k", V.conj(), w)

    def vcomb(c, V):
        return jnp.einsum("k,k...->...", c, V)

    def mk_cycle(static_kl: bool, do_vres: bool, do_hnew: bool,
                 full_out: bool):
        @jax.jit
        def run(V, H, j0, t):
            V = V.at[0].mul(1.0 + t)  # vary inputs (no relay replay)

            def body(j, state):
                V, H = state
                w = op.mult2d(V[j])
                mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)

                def full_orth(w):
                    c = vdots(V, w) * mask
                    w = w - vcomb(c, V)
                    c2 = vdots(V, w) * mask
                    w = w - vcomb(c2, V)
                    return w, c + c2

                w, c_tot = full_orth(w)
                beta = jnp.linalg.norm(w)
                is_brk = beta < eps_mach ** 0.75 * (
                    jnp.linalg.norm(c_tot) + eps_mach)

                def mk_restart(_):
                    rnd = jax.random.normal(jax.random.fold_in(key, j),
                                            vshape, rdtype)
                    rnd = rnd * opmask
                    rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                    rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                    return rnd, jnp.linalg.norm(rnd)

                w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                           lambda _: (w, beta), None)
                safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
                V = V.at[j + 1].set(w / safe)
                col = jnp.zeros((ncv + 1,), jnp.float32).at[:ncv].set(
                    c_tot[:ncv])
                col = jax.lax.dynamic_update_index_in_dim(
                    col, jnp.where(is_brk, 0.0, beta), j + 1, 0)
                H = H.at[:, j].set(col)
                return V, H

            V, H = jax.lax.fori_loop(j0, ncv, body, (V, H))
            beta = jnp.abs(H[ncv, ncv - 1])
            S = H[:ncv, :ncv]
            S = 0.5 * (S + S.T)
            theta, Q = eigh_small(S)
            last = Q[ncv - 1, :]
            resid = beta * jnp.abs(last)
            errest = resid / jnp.maximum(jnp.abs(theta), 1e-300)
            conv = errest < 1e-5
            k2 = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))
            if static_kl:
                kl = ncv // 2 + jnp.asarray(0)
            else:
                l = jnp.maximum(1, (ncv - k2) // 2)
                l = jnp.minimum(l, jnp.maximum(ncv - k2 - 1, 0))
                kl = jnp.minimum(k2 + l, ncv - 1)
            Vrot = jnp.einsum("kp,k...->p...", Q, V[:ncv])
            if do_vres == 2:
                # masked tail: the residual row lands at kl via a select
                # fused into the rotation epilogue — NO data-dependent
                # dynamic_update index anywhere in the graph
                rowmask = (jnp.arange(ncv) == kl).astype(jnp.float32)
                Vrot = (Vrot * (1.0 - rowmask)[:, None, None]
                        + rowmask[:, None, None] * V[ncv][None])
                V = V.at[:ncv].set(Vrot)
            else:
                V = V.at[:ncv].set(Vrot)
                if do_vres:
                    vres = V[ncv]
                    V = jax.lax.dynamic_update_index_in_dim(V, vres, kl,
                                                            axis=0)
            if do_hnew == 2:
                keep = (jnp.arange(ncv) < kl).astype(jnp.float32)
                rowm = (jnp.arange(ncv + 1) == kl).astype(jnp.float32)
                Hnew = jnp.zeros_like(H)
                Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
                    theta * keep)
                arrow = (beta * last) * keep
                Hnew = Hnew + rowm[:, None] * arrow[None, :]
                H = Hnew
            elif do_hnew:
                keep = (jnp.arange(ncv) < kl).astype(jnp.float32)
                Hnew = jnp.zeros_like(H)
                Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
                    theta * keep)
                arrow = (beta * last) * keep
                Hnew = jax.lax.dynamic_update_slice(Hnew, arrow[None, :],
                                                    (kl, 0))
                H = Hnew
            if full_out:
                return V, H, kl, k2, theta, errest, beta
            return V, H, kl

        return run

    V0 = jnp.asarray(
        rng.standard_normal((ncv + 1,) + vshape).astype(np.float32))
    V0 = V0 / jnp.linalg.norm(V0, axis=(1, 2), keepdims=True)
    H0 = jnp.zeros((ncv + 1, ncv), np.float32)

    def timeit(f, label, reps=4):
        try:
            o = f(V0, H0, jnp.asarray(ncols), jnp.float32(1e-4))
            jax.block_until_ready(o)
            V, H, j0 = o[0], o[1], o[2]
            t0 = time.perf_counter()
            for k in range(reps):
                o = f(V, H, j0 * 0 + ncols, jnp.float32((k + 2) * 1e-4))
                V, H, j0 = o[0], o[1], o[2]
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / reps
            log(f"{label}: {dt*1e3:.1f} ms/cycle ({dt/ncols*1e3:.2f} ms/col)")
        except Exception as e:
            log(f"{label} failed: {e!r}")

    log("compiling R_full...")
    timeit(mk_cycle(False, True, True, True), "R_full")
    log("compiling R_statickl...")
    timeit(mk_cycle(True, True, True, True), "R_statickl")
    log("compiling R_novres...")
    timeit(mk_cycle(False, False, True, True), "R_novres")
    log("compiling R_noHnew...")
    timeit(mk_cycle(False, True, False, True), "R_noHnew")
    log("compiling R_fewout...")
    timeit(mk_cycle(False, True, True, False), "R_fewout")
    log("compiling R_masked...")
    timeit(mk_cycle(False, 2, 2, True), "R_masked")

    from slepc_tpu.eps.ks_jit import get_ks_hep_cycle

    fn = get_ks_hep_cycle(op, key, ncv, "smallest", orth="xla")
    log("compiling LIB...")
    timeit(lambda V, H, j0, t: fn(V.at[0].mul(1.0 + t), H, j0, 1e-5), "LIB")
    log("done")


if __name__ == "__main__":
    main()
