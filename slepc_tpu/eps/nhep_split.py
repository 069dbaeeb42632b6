"""Split-complex Arnoldi / Krylov-Schur for NHEP — complex problems ON TPU.

The heavy n-dimensional work (SpMV, fused CGS2 orthogonalization, restart
rotation) runs as jitted REAL programs on stacked [re, im] planes
(ops/complex_split.py); only the ncv x ncv projected problem goes to host
LAPACK (complex Schur + eig), mirroring the reference's DS split
(sequential LAPACK on the projected matrix, dsnhep.c).

Reference anchors: Arnoldi extension BVMatArnoldi
(src/sys/classes/bv/interface/bvkrylov.c:56-113), Krylov-Schur NHEP
restart (src/eps/impls/krylov/krylovschur/krylovschur.c:227-337),
complex-scalar capability (include/slepcmath.h).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.complex_split import SplitComplexDIAOperator


@partial(jax.jit, static_argnames=("ncv",), donate_argnums=(1,))
def _arnoldi_split_extend(op, V, Hr, Hi, j0, key, *, ncv: int):
    """Extend the split-complex Arnoldi factorization from row j0 to ncv.

    V: (ncv+1, 2) + vshape transposed basis (rows are vectors, plane
    axis second); rows [0, j0) orthonormal, row j0 = start vector.
    Hr/Hi: (ncv+1, ncv) real/imag parts of the Hessenberg.
    One XLA program per cycle: SpMV + single-reduction CGS2 per column
    (bvorthog.c:91-132 semantics in complex arithmetic).
    """
    vshape = V.shape[2:]
    rdt = V.dtype
    # plane products V[:, p] * w[p] have shape (k,) + vshape: reduce
    # over the vshape axes
    red = tuple(range(1, V.ndim - 1))
    eps_mach = jnp.finfo(rdt).eps
    mask_planes = op.mask_planes

    hp = jax.lax.Precision.HIGHEST  # f32 default einsums run bf16
    # passes on TPU (~6e-3 error) — measured as a 4e-3 residual floor

    def cdots(V, w, mask):
        """c_k = <V_k, w> complex = conj(V_k)^T w on split planes."""
        cr = jnp.sum(V[:, 0] * w[0][None] + V[:, 1] * w[1][None],
                     axis=red) * mask
        ci = jnp.sum(V[:, 0] * w[1][None] - V[:, 1] * w[0][None],
                     axis=red) * mask
        return cr, ci

    def cupdate(V, cr, ci, w):
        """w - sum_k c_k V_k on split planes."""
        wr = w[0] - jnp.einsum("k,k...->...", cr, V[:, 0], precision=hp) \
            + jnp.einsum("k,k...->...", ci, V[:, 1], precision=hp)
        wi = w[1] - jnp.einsum("k,k...->...", cr, V[:, 1], precision=hp) \
            - jnp.einsum("k,k...->...", ci, V[:, 0], precision=hp)
        return jnp.stack([wr, wi])

    def body(j, state):
        V, Hr, Hi = state
        w = op.mult_split(V[j])
        mask = (jnp.arange(ncv + 1) < j + 1).astype(rdt)
        cr1, ci1 = cdots(V, w, mask)
        w = cupdate(V, cr1, ci1, w)
        cr2, ci2 = cdots(V, w, mask)
        w = cupdate(V, cr2, ci2, w)
        cr, ci = cr1 + cr2, ci1 + ci2
        beta = jnp.linalg.norm(w)
        is_brk = beta < eps_mach ** 0.75 * (
            jnp.sqrt(jnp.sum(cr * cr + ci * ci)) + eps_mach)

        def mk_restart(_):
            rnd = jax.random.normal(jax.random.fold_in(key, j),
                                    (2,) + vshape, rdt) * mask_planes
            r1, i1 = cdots(V, rnd, mask)
            rnd = cupdate(V, r1, i1, rnd)
            r2, i2 = cdots(V, rnd, mask)
            rnd = cupdate(V, r2, i2, rnd)
            return rnd, jnp.linalg.norm(rnd)

        w, beta_eff = jax.lax.cond(is_brk, mk_restart,
                                   lambda _: (w, beta), None)
        safe = jnp.where(beta_eff > 0, beta_eff, 1.0)
        V = V.at[j + 1].set(w / safe)
        colr = jnp.zeros((ncv + 1,), rdt).at[:ncv].set(cr[:ncv])
        colr = jax.lax.dynamic_update_index_in_dim(
            colr, jnp.where(is_brk, 0.0, beta), j + 1, 0)
        coli = jnp.zeros((ncv + 1,), rdt).at[:ncv].set(ci[:ncv])
        Hr = Hr.at[:, j].set(colr)
        Hi = Hi.at[:, j].set(coli)
        return V, Hr, Hi

    V, Hr, Hi = jax.lax.fori_loop(j0, ncv, body, (V, Hr, Hi))
    return V, Hr, Hi


@partial(jax.jit, static_argnames=("ncv",), donate_argnums=(1,))
def _rotate_split(V, Qr, Qi, src, dst, *, ncv: int):
    """Rows[:ncv] <- (Qr + i Qi)^T-combine (complex BVMultInPlace), then
    move the residual row from ``src`` to ``dst``.  Q is (ncv, ncv) with
    columns past the keep count zeroed by the host."""
    hp = jax.lax.Precision.HIGHEST
    Vr, Vi = V[:ncv, 0], V[:ncv, 1]
    nr = jnp.einsum("kp,k...->p...", Qr, Vr, precision=hp) \
        - jnp.einsum("kp,k...->p...", Qi, Vi, precision=hp)
    ni = jnp.einsum("kp,k...->p...", Qr, Vi, precision=hp) \
        + jnp.einsum("kp,k...->p...", Qi, Vr, precision=hp)
    V = V.at[:ncv].set(jnp.stack([nr, ni], axis=1))
    vres = V[src]
    return jax.lax.dynamic_update_index_in_dim(V, vres, dst, axis=0)


@partial(jax.jit, static_argnames=("k",))
def _true_resids_split(op, V, lamr, lami, *, k: int):
    """||A x_i - lam_i x_i|| / |lam_i| for the first k rows, on device."""
    def one(i, acc):
        x = V[i]
        ax = op.mult_split(x)
        lr, li = lamr[i], lami[i]
        rr = ax[0] - (lr * x[0] - li * x[1])
        ri = ax[1] - (lr * x[1] + li * x[0])
        nrm = jnp.sqrt(jnp.sum(rr * rr + ri * ri))
        mag = jnp.sqrt(lr * lr + li * li)
        return acc.at[i].set(nrm / jnp.maximum(mag, 1e-300))

    return jax.lax.fori_loop(0, k, one, jnp.zeros((k,), V.dtype))


def nhep_split_solve(op: SplitComplexDIAOperator, nev: int,
                     ncv: int = 32, tol: float = 1e-6,
                     which: str = "largest_magnitude", max_cycles: int = 200,
                     key=None, v0=None, log=None):
    """k eigenpairs of a complex operator via split-complex Krylov-Schur.

    Returns dict(lam (complex), resid, V (device split basis), stats).
    The extension + rotation are jitted device programs; the ncv x ncv
    Schur/eig runs on host LAPACK (replicated-DS tier).
    """
    import scipy.linalg as sla

    log = log or (lambda *_: None)
    key = key if key is not None else jax.random.PRNGKey(11)
    t0 = time.perf_counter()
    rdt = jnp.zeros((), op.dtype).real.dtype
    mask = op.mask_planes
    vshape = mask.shape[1:]
    if v0 is None:
        v0 = jax.random.normal(key, (2,) + vshape, rdt) * mask
    v0 = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((ncv + 1, 2) + vshape, rdt).at[0].set(v0)
    Hr = jnp.zeros((ncv + 1, ncv), rdt)
    Hi = jnp.zeros((ncv + 1, ncv), rdt)

    def sortkey(lam):
        if which == "largest_magnitude":
            return -np.abs(lam)
        if which == "largest_real":
            return -lam.real
        if which == "smallest_magnitude":
            return np.abs(lam)
        raise ValueError(f"unsupported which={which!r}")

    j0 = jnp.asarray(np.int32(0))
    k2 = 0
    cycles = 0
    cols = 0
    lam_out = np.zeros(ncv, complex)
    err_out = np.full(ncv, np.inf)
    while cycles < max_cycles:
        cols += ncv - int(j0)
        V, Hr, Hi = _arnoldi_split_extend(op, V, Hr, Hi, j0, key, ncv=ncv)
        cycles += 1
        Hh = np.asarray(Hr) + 1j * np.asarray(Hi)
        Hm = Hh[:ncv, :ncv]
        beta = float(abs(Hh[ncv, ncv - 1]))

        # Ritz pairs + residual estimates (beta * |last component|)
        lam, Y = np.linalg.eig(Hm)
        order = np.argsort(sortkey(lam), kind="stable")
        lam, Y = lam[order], Y[:, order]
        Yn = Y / np.linalg.norm(Y, axis=0, keepdims=True)
        errest = beta * np.abs(Yn[ncv - 1, :]) / np.maximum(
            np.abs(lam), 1e-300)
        conv = errest < tol
        k2 = int(np.cumprod(conv).sum())
        lam_out[:ncv] = lam
        err_out[:ncv] = errest
        if k2 >= nev:
            break

        # ---- Krylov-Schur restart: sorted complex Schur, keep kl ----
        kl = min(k2 + max(1, (ncv - k2) // 2), ncv - 1)
        thresh = sortkey(lam)[kl - 1]
        T, Z, sdim = sla.schur(
            Hm, output="complex",
            sort=lambda x: bool(sortkey(np.asarray([x]))[0]
                                <= thresh + 1e-300))
        kl = int(np.clip(sdim, 1, ncv - 1))
        Qpad = np.zeros((ncv, ncv), complex)
        Qpad[:, :kl] = Z[:, :kl]
        V = _rotate_split(V, jnp.asarray(Qpad.real, rdt),
                          jnp.asarray(Qpad.imag, rdt),
                          jnp.asarray(np.int32(ncv)),
                          jnp.asarray(np.int32(kl)), ncv=ncv)
        Hnew = np.zeros((ncv + 1, ncv), complex)
        Hnew[:kl, :kl] = T[:kl, :kl]
        # arrow row from the Krylov relation A V Z1 = V Z1 T11 +
        # beta v_res (e_m^T Z1)
        Hnew[kl, :kl] = beta * Z[ncv - 1, :kl]
        Hr = jnp.asarray(Hnew.real, rdt)
        Hi = jnp.asarray(Hnew.imag, rdt)
        j0 = jnp.asarray(np.int32(kl))

    # ---- extract eigenvectors: rotate the basis by the leading Ritz
    # vectors of the final projected matrix (normalized columns; each
    # rotated row IS an approximate eigenvector — a QR would mix them) ----
    k = min(max(k2, nev), ncv)
    Hm = np.asarray(Hr)[:ncv, :ncv] + 1j * np.asarray(Hi)[:ncv, :ncv]
    lamf, Yf = np.linalg.eig(Hm)
    orderf = np.argsort(sortkey(lamf), kind="stable")
    lamf, Yf = lamf[orderf], Yf[:, orderf]
    Ypad = np.zeros((ncv, ncv), complex)
    Ypad[:, :k] = Yf[:, :k] / np.linalg.norm(Yf[:, :k], axis=0,
                                             keepdims=True)
    V = _rotate_split(V, jnp.asarray(Ypad.real, rdt),
                      jnp.asarray(Ypad.imag, rdt),
                      jnp.asarray(np.int32(ncv)),
                      jnp.asarray(np.int32(ncv)), ncv=ncv)
    resid = np.asarray(_true_resids_split(
        op, V, jnp.asarray(lamf.real[:k], rdt),
        jnp.asarray(lamf.imag[:k], rdt), k=k))
    stats = {"cycles": cycles, "cols": cols,
             "wall_s": time.perf_counter() - t0, "k2": k2}
    return {"lam": lamf[:k], "resid": resid, "V": V, "nconv": k2,
            "stats": stats}
