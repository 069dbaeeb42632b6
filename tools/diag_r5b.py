"""Rotation-cost shootout at 2.1M rows f64 (the restart bottleneck).

diag_r5: _rotate_basis (chunked fori dot_general) = 347 ms/cycle at
(48, 2.1M) — ~3x off the f64-emulation traffic floor.  Variants:
  A. current chunked fori_loop
  B. ONE dot_general (temp ~3.2 GB at this scale — the emulation's raw
     speed; does NOT fit at 10.35M, measurement only)
  C. chunked with 4x bigger chunks
  D. batched einsum "kp,kcrw->pcrw" (chunk axis as a batch dim)
  E. f32-planes 3-matmul approximation + max error vs f64
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit(f, Q, V, reps=3):
    """CHAINED timing: the relay replays constant-input repeats from
    cache, so each call rotates the PREVIOUS output (Q orthogonal ->
    norms stay bounded) — no two dispatches see identical bytes."""
    import jax

    y = f(Q, V)
    float(y[0, 0, 0])  # block_until_ready LIES through the relay:
    t0 = time.perf_counter()  # force a scalar D2H readback instead
    for _ in range(reps):
        y = f(Q, y[: V.shape[0]])
        float(y[0, 0, 0])
    return (time.perf_counter() - t0) / reps, y


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    ncv = 48
    R, W = 4104, 512  # ~2.1M rows padded-ish (divisible by 4 for D)
    key = jax.random.PRNGKey(0)
    V = jax.random.normal(key, (ncv, R, W), jnp.float64)
    Q = jnp.asarray(np.linalg.qr(np.random.default_rng(1)
                                 .standard_normal((ncv, ncv)))[0])

    from slepc_tpu.eps.ks_jit import _rotate_basis

    @jax.jit
    def rotA(Q, V):
        return _rotate_basis(Q, V, ncv)

    log("A: compiling current chunked fori...")
    dt, yA = timeit(rotA, Q, V)
    log(f"A current chunked: {dt*1e3:.0f} ms")

    @jax.jit
    def rotB(Q, V):
        return jnp.einsum("kp,krw->prw", Q, V)

    log("B: compiling single dot_general...")
    try:
        dt, yB = timeit(rotB, Q, V)
        log(f"B single dot_general: {dt*1e3:.0f} ms  "
            f"err={float(jnp.max(jnp.abs(yA - yB))):.1e}")
    except Exception as e:
        log(f"B failed: {e!r}")

    # C: bigger chunks via a temporary _ROT_CHUNK_BYTES bump
    import slepc_tpu.eps.ks_jit as ksj

    old = ksj._ROT_CHUNK_BYTES
    ksj._ROT_CHUNK_BYTES = old * 4

    @jax.jit
    def rotC(Q, V):
        return _rotate_basis(Q, V, ncv)

    log("C: compiling 4x chunks...")
    try:
        dt, yC = timeit(rotC, Q, V)
        log(f"C 4x chunk: {dt*1e3:.0f} ms  "
            f"err={float(jnp.max(jnp.abs(yA - yC))):.1e}")
    finally:
        ksj._ROT_CHUNK_BYTES = old

    nch = 4
    Rc = R // nch

    @jax.jit
    def rotD(Q, V):
        Vb = V[:, : nch * Rc].reshape(ncv, nch, Rc, W)
        out = jnp.einsum("kp,kcrw->pcrw", Q, Vb)
        return out.reshape(ncv, nch * Rc, W)

    log("D: compiling batched einsum...")
    try:
        dt, yD = timeit(rotD, Q, V)
        log(f"D batched einsum: {dt*1e3:.0f} ms  "
            f"err={float(jnp.max(jnp.abs(yA[:, :nch*Rc] - yD))):.1e}")
    except Exception as e:
        log(f"D failed: {e!r}")

    from slepc_tpu.ops.dia_pallas import ds_join, ds_split

    @jax.jit
    def rotE(Q, V):
        Vh, Vl = ds_split(V)
        Qh = Q.astype(jnp.float32)
        Yh = jnp.einsum("kp,krw->prw", Qh, Vh)
        Yc = jnp.einsum("kp,krw->prw", Qh, Vl)
        return Yh.astype(jnp.float64) + Yc.astype(jnp.float64)

    log("E: compiling f32-planes...")
    dt, yE = timeit(rotE, Q, V)
    scale = float(jnp.max(jnp.abs(yA)))
    log(f"E f32-planes: {dt*1e3:.0f} ms  "
        f"relerr={float(jnp.max(jnp.abs(yA - yE)))/scale:.1e}")

    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def rotF(Q, V):
        Vh, Vl = ds_split(V)
        Qh = Q.astype(jnp.float32)
        Yh = jnp.einsum("kp,krw->prw", Qh, Vh, precision=hp)
        Yc = jnp.einsum("kp,krw->prw", Qh, Vl, precision=hp)
        return Yh.astype(jnp.float64) + Yc.astype(jnp.float64)

    log("F: compiling f32-planes HIGHEST...")
    dt, yF = timeit(rotF, Q, V)
    log(f"F f32-planes highest: {dt*1e3:.0f} ms  "
        f"relerr={float(jnp.max(jnp.abs(yA - yF)))/scale:.1e}")

    @jax.jit
    def rotG(Q, V):
        Vh, Vl = ds_split(V)
        Qh = Q.astype(jnp.float32)
        Ql = (Q - Qh.astype(jnp.float64)).astype(jnp.float32)
        Yh = jnp.einsum("kp,krw->prw", Qh, Vh, precision=hp)
        Yc = jnp.einsum("kp,krw->prw", Qh, Vl, precision=hp)
        Yq = jnp.einsum("kp,krw->prw", Ql, Vh, precision=hp)
        return (Yh.astype(jnp.float64) + Yc.astype(jnp.float64)
                + Yq.astype(jnp.float64))

    log("G: compiling 3-term f32 HIGHEST...")
    dt, yG = timeit(rotG, Q, V)
    log(f"G 3-term highest: {dt*1e3:.0f} ms  "
        f"relerr={float(jnp.max(jnp.abs(yA - yG)))/scale:.1e}")


if __name__ == "__main__":
    main()
