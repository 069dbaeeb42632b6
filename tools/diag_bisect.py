"""Bisect the REAL ks_hep_cycle: early-return at increasing stages.

stage 1: extension fori_loop only
stage 2: + projected eigh + convergence bookkeeping
stage 3: + rotation einsum + V row updates
stage 4: full verbatim cycle (reference ~672 ms/cycle)

The function source is imported from slepc_tpu and re-jitted with a
stage flag via a thin reimplementation that calls the same building
blocks — no, simpler: we inline-copy the real code path by calling
ks_hep_cycle itself for stage 4 and reproducing its exact internals for
stages 1-3 using ITS module-level helpers.
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
    from functools import partial

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator
    from slepc_tpu.ops.jacobi_eigh import eigh_small

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op0 = DIAPaddedOperator.from_dia(A)
    ncv = 32
    x0 = op0.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnames=("ncv", "which", "stage"))
    def cycle(op, V, H, j0, tol, key, ncv, which="smallest", stage=4):
        """Verbatim transcription of ks_hep_cycle with staged early exit."""
        vshape = V.shape[1:]
        rdtype = jnp.zeros((), V.dtype).real.dtype
        eps_mach = jnp.finfo(rdtype).eps
        opmult = op.mult2d
        opmask = op.mask2d

        def vdots(V, w):
            return jnp.einsum("k...,...->k", V.conj(), w)

        def vcomb(c, V):
            return jnp.einsum("k,k...->...", c, V)

        def body(j, state):
            V, H = state
            v = V[j]
            w = opmult(v)
            mask = (jnp.arange(ncv + 1) < j + 1).astype(rdtype)

            def full_orth(w):
                c = vdots(V, w) * mask
                w = w - vcomb(c, V)
                c2 = vdots(V, w) * mask
                w = w - vcomb(c2, V)
                return w, c + c2

            w, c_tot = full_orth(w)
            beta = jnp.linalg.norm(w)
            is_brk = beta < eps_mach ** 0.75 * (jnp.linalg.norm(c_tot)
                                                + eps_mach)

            def mk_restart(_):
                rnd = jax.random.normal(jax.random.fold_in(key, j), vshape,
                                        rdtype).astype(V.dtype)
                rnd = rnd * opmask
                rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                rnd = rnd - vcomb(vdots(V, rnd) * mask, V)
                return rnd, jnp.linalg.norm(rnd)

            w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                       lambda _: (w, beta), None)
            safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
            V = V.at[j + 1].set(w / safe)
            col = jnp.zeros((ncv + 1,), dtype=H.dtype)
            col = col.at[:ncv].set(c_tot[:ncv])
            col = jax.lax.dynamic_update_index_in_dim(
                col, jnp.where(is_brk, 0.0, beta).astype(H.dtype), j + 1, 0)
            H = H.at[:, j].set(col)
            return V, H

        V, H = jax.lax.fori_loop(j0, ncv, body, (V, H))
        beta = jnp.abs(H[ncv, ncv - 1])
        if stage == 1:
            z = jnp.zeros((ncv,), rdtype)
            return V, H, j0, jnp.asarray(0), z, z, beta

        S = H[:ncv, :ncv]
        S = 0.5 * (S + S.conj().T)
        theta, Q = eigh_small(S)
        last = Q[ncv - 1, :]
        resid = beta * jnp.abs(last)
        errest = resid / jnp.maximum(jnp.abs(theta), 1e-300)
        conv = errest < tol
        k2 = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))
        l = jnp.maximum(1, (ncv - k2) // 2)
        l = jnp.minimum(l, jnp.maximum(ncv - k2 - 1, 0))
        kl = jnp.minimum(k2 + l, ncv - 1)
        if stage == 2:
            return V, H, kl, k2, theta, errest, beta

        Vrot = jnp.einsum("kp,k...->p...", Q.astype(V.dtype), V[:ncv])
        V = V.at[:ncv].set(Vrot)
        vres = V[ncv]
        V = jax.lax.dynamic_update_index_in_dim(V, vres, kl, axis=0)
        if stage == 3:
            return V, H, kl, k2, theta, errest, beta

        keep = (jnp.arange(ncv) < kl).astype(H.dtype)
        Hnew = jnp.zeros_like(H)
        Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
            theta.astype(H.dtype) * keep)
        arrow = (beta * last).astype(H.dtype) * keep
        Hnew = jax.lax.dynamic_update_slice(Hnew, arrow[None, :], (kl, 0))
        return V, Hnew, kl, k2, theta, errest, beta

    rng = np.random.default_rng(0)
    v0n = x0 / jnp.linalg.norm(x0)

    def chain(stage, reps=4):
        Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
        Hb = jnp.zeros((ncv + 1, ncv), np.float32)
        o = cycle(op0, Vb, Hb, jnp.asarray(0), 1e-5, key, ncv=ncv,
                  stage=stage)
        jax.block_until_ready(o)
        st = (o[0], o[1], o[2] * 0 + 16)  # steady-state 16-column extension
        t0 = time.perf_counter()
        for _ in range(reps):
            o = cycle(op0, st[0], st[1], st[2], 1e-5, key, ncv=ncv,
                      stage=stage)
            st = (o[0], o[1], o[2] * 0 + 16)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / reps

    for stg in (1, 2, 3, 4):
        log(f"timing stage {stg}...")
        dt = chain(stg)
        log(f"stage {stg}: {dt*1e3:.1f} ms/cycle")

    # reference: the library function itself
    from slepc_tpu.eps.ks_jit import ks_hep_cycle

    Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
    Hb = jnp.zeros((ncv + 1, ncv), np.float32)
    o = ks_hep_cycle(op0, Vb, Hb, jnp.asarray(0), 1e-5, key, ncv=ncv,
                     which="smallest")
    jax.block_until_ready(o)
    st = (o[0], o[1], o[2] * 0 + 16)
    t0 = time.perf_counter()
    for _ in range(4):
        o = ks_hep_cycle(op0, st[0], st[1], st[2], 1e-5, key, ncv=ncv,
                         which="smallest")
        st = (o[0], o[1], o[2] * 0 + 16)
    jax.block_until_ready(o)
    log(f"library ks_hep_cycle (j0 pinned 16): "
        f"{(time.perf_counter()-t0)/4*1e3:.1f} ms/cycle")
    log("done")


if __name__ == "__main__":
    main()
