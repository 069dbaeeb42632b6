"""Validate the fix: factory-jitted KS cycle with op/key closed over.

P1: verbatim ks_hep_cycle math, but op+key+ncv+which captured by closure;
    jitted over (V, H, j0, tol) only.
P2: control — the library ks_hep_cycle (op/key traced args), expect slow.
Both chained at steady-state j0=16.
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

    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator
    from slepc_tpu.ops.jacobi_eigh import eigh_small

    side = 2896
    n = side * side
    A = laplacian_2d(side, side, dtype=np.float32)
    op = DIAPaddedOperator.from_dia(A)
    ncv = 32
    x0 = op.pad2d(jnp.ones((n,), np.float32))
    vshape = x0.shape
    key = jax.random.PRNGKey(0)

    def make_cycle(op, key, ncv, which="smallest"):
        opmult = op.mult2d
        opmask = op.mask2d

        @jax.jit
        def cycle(V, H, j0, tol):
            vshape = V.shape[1:]
            rdtype = jnp.zeros((), V.dtype).real.dtype
            eps_mach = jnp.finfo(rdtype).eps

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
                is_brk = beta < eps_mach ** 0.75 * (
                    jnp.linalg.norm(c_tot) + eps_mach)

                def mk_restart(_):
                    rnd = jax.random.normal(jax.random.fold_in(key, j),
                                            vshape, rdtype).astype(V.dtype)
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
                    col, jnp.where(is_brk, 0.0, beta).astype(H.dtype),
                    j + 1, 0)
                H = H.at[:, j].set(col)
                return V, H

            V, H = jax.lax.fori_loop(j0, ncv, body, (V, H))
            beta = jnp.abs(H[ncv, ncv - 1])
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
            Vrot = jnp.einsum("kp,k...->p...", Q.astype(V.dtype), V[:ncv])
            V = V.at[:ncv].set(Vrot)
            vres = V[ncv]
            V = jax.lax.dynamic_update_index_in_dim(V, vres, kl, axis=0)
            keep = (jnp.arange(ncv) < kl).astype(H.dtype)
            Hnew = jnp.zeros_like(H)
            Hnew = Hnew.at[jnp.arange(ncv), jnp.arange(ncv)].set(
                theta.astype(H.dtype) * keep)
            arrow = (beta * last).astype(H.dtype) * keep
            Hnew = jax.lax.dynamic_update_slice(Hnew, arrow[None, :],
                                                (kl, 0))
            return V, Hnew, kl, k2, theta, errest, beta

        return cycle

    v0n = x0 / jnp.linalg.norm(x0)
    Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
    Hb = jnp.zeros((ncv + 1, ncv), np.float32)

    cyc = make_cycle(op, key, ncv)
    o = cyc(Vb, Hb, jnp.asarray(0), 1e-5)
    jax.block_until_ready(o)
    st = (o[0], o[1], o[2] * 0 + 16)
    t0 = time.perf_counter()
    for _ in range(4):
        o = cyc(st[0], st[1], st[2], 1e-5)
        st = (o[0], o[1], o[2] * 0 + 16)
    jax.block_until_ready(o)
    log(f"P1 factory cycle: {(time.perf_counter()-t0)/4*1e3:.1f} ms/cycle")

    from slepc_tpu.eps.ks_jit import ks_hep_cycle

    Vb = jnp.zeros((ncv + 1,) + vshape, np.float32).at[0].set(v0n)
    Hb = jnp.zeros((ncv + 1, ncv), np.float32)
    o = ks_hep_cycle(op, Vb, Hb, jnp.asarray(0), 1e-5, key, ncv=ncv,
                     which="smallest")
    jax.block_until_ready(o)
    st = (o[0], o[1], o[2] * 0 + 16)
    t0 = time.perf_counter()
    for _ in range(4):
        o = ks_hep_cycle(op, st[0], st[1], st[2], 1e-5, key, ncv=ncv,
                         which="smallest")
        st = (o[0], o[1], o[2] * 0 + 16)
    jax.block_until_ready(o)
    log(f"P2 library cycle: {(time.perf_counter()-t0)/4*1e3:.1f} ms/cycle")
    log("done")


if __name__ == "__main__":
    main()
