"""Round-4 on-TPU diagnostics (run solo on the chip):

1. blocked KS cycle A/B: block-SpMV Pallas kernel vs vmap'd single-vector
   kernel (the r3 diagnosis named the vmap diagonal re-reads as the main
   leak toward the ~1.5 ms/col byte floor);
2. GD fused-cycle stall: time the cycle with the per-expansion projected
   eigh replaced by a cheap identity extraction — isolates whether
   eigh_small dominates the 1,138 ms/expansion from BENCH_r03.

Usage: python tools/diag_r4.py [section...]   (default: all)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", flush=True)


def section_blocked():
    from jax.tree_util import register_pytree_node_class

    from slepc_tpu.eps.ks_jit import get_ks_hep_cycle_blocked
    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    @register_pytree_node_class
    class DIAPaddedOperatorNoBlk(DIAPaddedOperator):
        """Same operator, block kernel masked off -> vmap fallback.
        Separate pytree class = separate jit cache entry."""

        mult2d_block = None

    side = 2896
    n = side * side
    dtype = np.float32
    A = laplacian_2d(side, side, dtype=dtype)
    ncv, b = 32, 8
    cols = ncv // 2
    key = jax.random.PRNGKey(0)

    for tag, cls in (("block-kernel", DIAPaddedOperator),
                     ("vmap", DIAPaddedOperatorNoBlk)):
        op = cls.from_dia(A)
        v0 = np.asarray(op.pad2d(jnp.ones((n,), dtype)))
        v0 = v0 / np.linalg.norm(v0)
        rngb = np.random.default_rng(1)
        Mb = rngb.standard_normal((v0.size, b)).astype(dtype)
        Mb[:, 0] = v0.ravel()
        Qb, _ = np.linalg.qr(Mb)
        V = jnp.zeros((ncv + b,) + v0.shape, dtype)
        for i in range(b):
            V = V.at[i].set(jnp.asarray(Qb[:, i].reshape(v0.shape)))
        V = V * op.mask2d[None]
        H = jnp.zeros((ncv + b, ncv), dtype)
        cyc = get_ks_hep_cycle_blocked(op, key, ncv, b, "smallest")
        log(f"blocked[{tag}]: compiling...")
        o = cyc(V, H, jnp.asarray(np.int32(0)), 1e-5)
        jax.block_until_ready(o[3])
        st = (o[0], o[1], o[2])
        t0 = time.perf_counter()
        NC = 6
        for _ in range(NC):
            o = cyc(st[0], st[1], jnp.asarray(np.int32(int(st[2]))), 1e-5)
            st = (o[0], o[1], o[2])
        jax.block_until_ready(o[3])
        dt = (time.perf_counter() - t0) / NC
        log(f"blocked[{tag}]: {dt*1e3:.1f} ms/cycle = "
            f"{dt/cols*1e3:.2f} ms/col")


def section_gd():
    """Time the fused GD cycle vs a variant without the per-expansion
    eigh (diagnostic only: replaces the projected solve with diagonal
    extraction — wrong math, right traffic)."""
    from functools import partial

    from slepc_tpu.eps.gd_jit import _gd_cycle_body
    from slepc_tpu.eps.ks_jit import _prepare_fast_operator
    from slepc_tpu.mat.linop import DIAOperator
    from slepc_tpu.ops import jacobi_eigh

    ng = 1 << 20
    dg = np.linspace(10.0, 30.0, ng).astype(np.float32)
    dg[:3] = [1.0, 2.0, 3.0]
    lo = np.zeros(ng, np.float32)
    hi = np.zeros(ng, np.float32)
    hi[:-1] = -1.0
    lo[1:] = -1.0
    Ag = DIAOperator((-1, 0, 1), np.stack([lo, dg, hi]))

    class _E:
        pass

    e = _E()
    e.n = ng
    e.A = Ag
    op, padded, n = _prepare_fast_operator(e, Ag, np.dtype(np.float32))
    ncv = 24
    key = jax.random.PRNGKey(7)
    dinv = padded.pad2d(jnp.ones(ng, jnp.float32)) * padded.mask2d \
        if padded is not None else jnp.ones(n, jnp.float32)
    v0 = np.zeros(ng, np.float32)
    v0[:] = np.random.default_rng(0).standard_normal(ng)
    v0j = padded.pad2d(jnp.asarray(v0)) if padded is not None \
        else jnp.asarray(v0)
    v0j = v0j / jnp.linalg.norm(v0j)
    V = jnp.zeros((ncv,) + v0j.shape, jnp.float32).at[0].set(v0j)
    W = jnp.zeros_like(V).at[0].set(op.mult2d(v0j))
    G = jnp.zeros((ncv, ncv), jnp.float32)
    G = G.at[0, 0].set(jnp.vdot(v0j, W[0]).real)

    impl = jax.jit(_gd_cycle_body, static_argnames=("ncv", "which"))

    def run(tag):
        o = impl(op, dinv, V, W, G, jnp.asarray(np.int32(1)),
                 jnp.asarray(np.int32(0)), 1e-6, key, ncv=ncv,
                 which="smallest")
        jax.block_until_ready(o[4])
        st = o
        t0 = time.perf_counter()
        NC = 3
        for _ in range(NC):
            st = impl(op, dinv, st[0], st[1], st[2],
                      jnp.asarray(np.int32(int(st[3]))),
                      jnp.asarray(np.int32(0)), 1e-6, key, ncv=ncv,
                      which="smallest")
        jax.block_until_ready(st[4])
        dt = (time.perf_counter() - t0) / NC
        exp_per_cycle = ncv - 12  # steady-state fill
        log(f"gd[{tag}]: {dt*1e3:.0f} ms/cycle ~ "
            f"{dt/exp_per_cycle*1e3:.0f} ms/expansion")

    log("gd[eigh]: compiling...")
    run("eigh")

    # variant: replace eigh_small with a cheap fake (diagonal extraction)
    real_eigh = jacobi_eigh.eigh_small

    def fake_eigh(S):
        nn = S.shape[0]
        return jnp.sort(jnp.real(jnp.diag(S))), jnp.eye(nn, dtype=S.dtype)

    jacobi_eigh.eigh_small = fake_eigh
    try:
        import importlib

        import slepc_tpu.eps.gd_jit as gdmod

        importlib.reload(gdmod)
        impl2 = jax.jit(gdmod._gd_cycle_body,
                        static_argnames=("ncv", "which"))

        def run2(tag):
            o = impl2(op, dinv, V, W, G, jnp.asarray(np.int32(1)),
                      jnp.asarray(np.int32(0)), 1e-6, key, ncv=ncv,
                      which="smallest")
            jax.block_until_ready(o[4])
            st = o
            t0 = time.perf_counter()
            NC = 3
            for _ in range(NC):
                st = impl2(op, dinv, st[0], st[1], st[2],
                           jnp.asarray(np.int32(int(st[3]))),
                           jnp.asarray(np.int32(0)), 1e-6, key, ncv=ncv,
                           which="smallest")
            jax.block_until_ready(st[4])
            dt = (time.perf_counter() - t0) / NC
            log(f"gd[{tag}]: {dt*1e3:.0f} ms/cycle ~ "
                f"{dt/12*1e3:.0f} ms/expansion")

        log("gd[no-eigh]: compiling...")
        run2("no-eigh")
    finally:
        jacobi_eigh.eigh_small = real_eigh
        import importlib

        import slepc_tpu.eps.gd_jit as gdmod

        importlib.reload(gdmod)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["blocked", "gd"]
    log(f"backend: {jax.default_backend()}")
    if "blocked" in sections:
        section_blocked()
    if "gd" in sections:
        section_gd()
    log("done")
