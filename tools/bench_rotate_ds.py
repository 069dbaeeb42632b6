"""TPU A/B: DS Pallas rotation kernel vs chunked-XLA f64 rotation.

Shapes match the round-5 diagnosis point (48 x ~2.1M f64 basis,
truncated to 40 output rows).  Inputs generated on device; timing
chains each iteration's output into the next input inside one jitted
fori_loop and verifies with a final scalar readback (CLAUDE.md timing
rules).  Run SOLO on the TPU.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

import slepc_tpu  # noqa: F401  (x64 on)
from slepc_tpu.ops.rotate_pallas import rotate_basis_ds
from slepc_tpu.eps.ks_jit import _rotate_basis

import os
K, P, R, W = 48, 40, int(os.environ.get("ROT_R", "4096")), 512
NIT = int(os.environ.get("ROT_NIT", "8"))

key = jax.random.PRNGKey(0)
V = jax.random.normal(key, (K, R, W), jnp.float64)
V = V / jnp.linalg.norm(V.reshape(K, -1), axis=1)[:, None, None]
Qm, _ = np.linalg.qr(np.random.default_rng(0).standard_normal((K, K)))
Q = jnp.asarray(Qm[:, :P])
print(f"basis {V.nbytes/1e9:.2f} GB f64, Q {K}x{P}", file=sys.stderr)


def chain(rot):
    def body(i, Vc):
        out = rot(Q, Vc)
        # feed output back (scaled) so no dispatch replays from cache
        return Vc.at[:P].set(out * np.float64(0.9999)).at[0, 0, 0].add(
            1e-9 * (i + 1))
    return jax.jit(lambda Vc: jax.lax.fori_loop(0, NIT, body, Vc))


def run(tag, rot):
    f = chain(rot)
    t0 = time.time()
    out = f(V)
    s = float(out[0, 0, 0])  # scalar readback = execution really done
    t_cold = time.time() - t0
    t0 = time.time()
    out = f(V.at[0, 0, 0].add(1e-7))
    s = float(out[0, 0, 0])
    dt = (time.time() - t0) / NIT
    print(f"{tag}: {dt*1e3:.1f} ms/rotation (warm, {NIT} chained; "
          f"cold {t_cold:.1f} s; readback {s:.6f})")
    return dt


# correctness first, one small dispatch each
Vs = V[:, :64]
r_ref = np.asarray(jax.jit(lambda q, v: _rotate_basis(q, v, K))(Q, Vs))
r_ds = np.asarray(rotate_basis_ds(Q, Vs))
err = np.abs(r_ds - r_ref).max() / np.abs(r_ref).max()
print(f"DS kernel vs XLA f64 rel err (small): {err:.3e}")
assert err < 5e-13, err

dt_x = run("xla-chunked-f64", lambda q, v: _rotate_basis(q, v, K))
dt_d = run("ds-pallas", lambda q, v: rotate_basis_ds(q, v))
print(f"speedup: {dt_x/dt_d:.2f}x")
