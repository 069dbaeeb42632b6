"""BV panel-orthogonalization Pallas kernels (ops/bv_pallas.py).

Kernel-vs-einsum equivalence on CPU (interpret mode executes the same
kernel path the TPU compiles), and cycle-level agreement between the
pallas and xla orthogonalization implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slepc_tpu.ops import bv_pallas as bvp


@pytest.mark.parametrize("K,b,R", [(9, 1, 64), (9, 3, 64), (33, 8, 384)])
def test_panel_kernels_match_einsum(K, b, R):
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((K, R, bvp.W)).astype(np.float32))
    Wb = jnp.asarray(rng.standard_normal((b, R, bvp.W)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((K, b)).astype(np.float32))

    d = bvp.panel_dots(V, Wb)
    d_ref = jnp.einsum("krw,mrw->km", V, Wb)
    assert float(jnp.abs(d - d_ref).max() / jnp.abs(d_ref).max()) < 1e-5

    u = bvp.panel_update(V, C, Wb)
    u_ref = Wb - jnp.einsum("km,krw->mrw", C, V)
    assert float(jnp.abs(u - u_ref).max() / jnp.abs(u_ref).max()) < 1e-5

    u2, d2 = bvp.panel_update_dots(V, C, Wb)
    d2_ref = jnp.einsum("krw,mrw->km", V, u_ref)
    assert float(jnp.abs(u2 - u_ref).max() / jnp.abs(u_ref).max()) < 1e-5
    assert float(jnp.abs(d2 - d2_ref).max()
                 / (jnp.abs(d2_ref).max() + 1e-6)) < 1e-4


def _padded_op(side=90):
    from slepc_tpu.mat.generators import laplacian_2d
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

    A = laplacian_2d(side, side, dtype=np.float32)
    return A, DIAPaddedOperator.from_dia(A)


def test_cycle_pallas_matches_xla():
    from slepc_tpu.eps.ks_jit import ks_hep_cycle

    A, op = _padded_op()
    ncv = 12
    x0 = op.pad2d(jnp.ones((A.shape[0],), np.float32))
    v0 = x0 / jnp.linalg.norm(x0)
    V = jnp.zeros((ncv + 1,) + x0.shape, np.float32).at[0].set(v0)
    H = jnp.zeros((ncv + 1, ncv), np.float32)
    key = jax.random.PRNGKey(0)
    oa = ks_hep_cycle(op, V, H, jnp.asarray(0), 1e-5, key, ncv=ncv,
                      which="largest", orth="pallas")
    ob = ks_hep_cycle(op, V, H, jnp.asarray(0), 1e-5, key, ncv=ncv,
                      which="largest", orth="xla")
    assert float(jnp.abs(oa[4] - ob[4]).max()) < 1e-4
    # chain cycles on both paths: they must stay in numerical agreement
    # and converge toward the true extreme eigenvalue
    sa, sb = oa, ob
    for _ in range(12):
        sa = ks_hep_cycle(op, sa[0], sa[1], sa[2], 1e-6, key, ncv=ncv,
                          which="largest", orth="pallas")
        sb = ks_hep_cycle(op, sb[0], sb[1], sb[2], 1e-6, key, ncv=ncv,
                          which="largest", orth="xla")
    from scipy.sparse.linalg import eigsh

    ev = float(eigsh(A.to_scipy(), k=1, which="LA",
                     return_eigenvectors=False)[0])
    assert abs(float(sa[4][0]) - ev) < 1e-3 * abs(ev)
    assert abs(float(sa[4][0]) - float(sb[4][0])) < 1e-3 * abs(ev)


def test_blocked_cycle_pallas_matches_xla():
    from slepc_tpu.eps.ks_jit import ks_hep_cycle_blocked

    A, op = _padded_op()
    ncv, b = 12, 4
    x0 = op.pad2d(jnp.ones((A.shape[0],), np.float32))
    v0 = x0 / jnp.linalg.norm(x0)
    key = jax.random.PRNGKey(0)
    V = jnp.zeros((ncv + b,) + x0.shape, np.float32)
    M = np.random.default_rng(1).standard_normal(
        (int(np.prod(x0.shape)), b)).astype(np.float32)
    M[:, 0] = np.asarray(v0).ravel()
    Q, _ = np.linalg.qr(M)
    for i in range(b):
        V = V.at[i].set(jnp.asarray(Q[:, i].reshape(x0.shape)))
    V = V * op.mask2d[None]
    # re-orthonormalize after halo masking
    fl = np.asarray(V[:b].reshape(b, -1))
    Qm, _ = np.linalg.qr(fl.T)
    for i in range(b):
        V = V.at[i].set(jnp.asarray(Qm[:, i].reshape(x0.shape)
                                    .astype(np.float32)))
    H = jnp.zeros((ncv + b, ncv), np.float32)
    oa = ks_hep_cycle_blocked(op, V, H, jnp.asarray(0), 1e-5, key,
                              ncv=ncv, b=b, which="largest", orth="pallas")
    ob = ks_hep_cycle_blocked(op, V, H, jnp.asarray(0), 1e-5, key,
                              ncv=ncv, b=b, which="largest", orth="xla")
    assert float(jnp.abs(oa[4] - ob[4]).max()) < 1e-4


def test_laplacian_3d_device_matches_host():
    from slepc_tpu.mat.generators import (laplacian_3d, laplacian_3d_device,
                                          laplacian_3d_eigs)

    nx, ny, nz = 7, 6, 5
    A = laplacian_3d(nx, ny, nz, dtype=np.float64)
    op = laplacian_3d_device(nx, ny, nz, dtype=np.float64)
    x = np.random.default_rng(0).standard_normal(nx * ny * nz)
    y1 = A.to_scipy() @ x
    y2 = np.asarray(op.unpad(op.mult2d(op.pad2d(jnp.asarray(x)))))
    assert np.abs(y1 - y2).max() / np.abs(y1).max() < 1e-13
    ev = np.sort(np.linalg.eigvalsh(A.to_scipy().toarray()))[:10]
    assert np.abs(ev - laplacian_3d_eigs(nx, ny, nz, k=10)).max() < 1e-12
