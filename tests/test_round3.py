"""Round-3 additions: fused power cycle, misc hardening."""

import jax.numpy as jnp
import numpy as np
import pytest

import slepc_tpu as st
from slepc_tpu.mat.generators import laplacian_2d, laplacian_2d_eigs


def test_power_fused_chunk_matches_host():
    """The chunked fused power cycle must converge to the same dominant
    eigenpairs as the per-step host loop (reference power.c semantics)."""
    A = laplacian_2d(12, 12, dtype=np.float64)
    n = 144
    lam_max = np.sort(np.linalg.eigvalsh(A.to_dense()))[::-1][:2]

    eps = st.EPS(A, problem_type="hep", nev=2, tol=1e-9, max_it=20000)
    eps.set_type("power")
    eps.solve()
    assert eps.nconv == 2
    got = np.sort(eps.eigenvalues.real)[::-1]
    assert np.allclose(got, lam_max, rtol=1e-7)

    # host path (chunk=1 disables fusion) agrees
    eps2 = st.EPS(A, problem_type="hep", nev=2, tol=1e-9, max_it=20000)
    eps2.set_type("power")
    eps2.power_chunk = 1
    eps2.solve()
    assert eps2.nconv == 2
    assert np.allclose(np.sort(eps2.eigenvalues.real)[::-1], got, rtol=1e-8)


def test_power_fused_deflation_orthogonality():
    """Locked vectors from the fused path stay mutually orthogonal."""
    A = laplacian_2d(10, 10, dtype=np.float64)
    eps = st.EPS(A, problem_type="hep", nev=3, tol=1e-8, max_it=20000)
    eps.set_type("power")
    eps.solve()
    assert eps.nconv == 3
    V = eps.get_eigenvectors()
    G = V.conj().T @ V
    assert np.allclose(G, np.eye(3), atol=1e-6)


def test_ciss_adaptive_tolerances():
    """Adaptive per-point inner tolerances (moment-contribution driven,
    cost-bucketed — reference contour machinery role slepccontour.c:22-118)
    match fixed-tol accuracy with measurably fewer inner iterations."""
    import slepc_tpu as st
    from slepc_tpu.mat.generators import laplacian_1d_eigs

    n = 200
    A = st.laplacian_1d(n)
    exact = laplacian_1d_eigs(n)
    want = exact[(exact > 0.5) & (exact < 0.8)]
    inner = {}
    for adaptive in (True, False):
        eps = st.EPS(A, problem_type="hep", solver="ciss", tol=1e-8)
        eps.set_rg(st.RGEllipse(center=0.65, radius=0.15, vscale=0.4))
        eps.ciss_solver = "batched"
        eps.ciss_adaptive = adaptive
        eps.solve()
        got = np.sort(eps.eigenvalues[: eps.nconv].real)
        assert eps.nconv == len(want)
        assert np.abs(got - want).max() < 1e-8
        inner[adaptive] = eps.ciss_inner_iters
    assert inner[True] < 0.95 * inner[False], inner


def test_gd_fused_matches_host():
    """Fused GD cycle (eps/gd_jit.py) matches the host Davidson loop on a
    variable-diagonal HEP problem (reference gd/gd.c semantics)."""
    import scipy.sparse as sp
    import slepc_tpu as st
    from slepc_tpu.sys.sort import Which

    n = 500
    d = np.linspace(1, 50, n)
    A = sp.diags([d, -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1],
                 format="csr")
    exact = np.sort(np.linalg.eigvalsh(A.toarray()))[:3]
    op = st.from_scipy(A)
    for fused in (True, False):
        eps = st.EPS(op, problem_type="hep", which=Which.SMALLEST_REAL,
                     nev=3, solver="gd", ncv=20, max_it=2000, tol=1e-8)
        eps.set_st(st.STPrecond([op]))
        eps.gd_fused = fused
        eps.solve()
        assert eps.nconv >= 3, fused
        got = np.sort(eps.eigenvalues[:3].real)
        np.testing.assert_allclose(got, exact, rtol=1e-7)
