"""EPS Krylov-Schur golden tests.

Modeled on the reference test strategy (SURVEY §4): deterministic
eigenvalue checks at fixed seeds against closed-form/scipy values on
Laplacian-class matrices (reference: src/eps/tutorials/ex1.c, ex2.c,
src/eps/tests/test1.c patterns).
"""

import numpy as np
import pytest

import slepc_tpu as st
from slepc_tpu.sys.sort import Which


def test_hep_laplacian1d_largest():
    n = 200
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL, nev=6)
    eps.solve()
    assert eps.nconv >= 6
    got = np.sort(eps.eigenvalues[:6].real)[::-1]
    want = exact[::-1][:6]
    np.testing.assert_allclose(got, want, rtol=1e-7)
    for i in range(6):
        assert eps.compute_error(i) < 1e-7


def test_hep_laplacian1d_smallest():
    n = 100
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", which=Which.SMALLEST_REAL, nev=4, ncv=40)
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(eps.eigenvalues[:4].real)
    np.testing.assert_allclose(got, exact[:4], rtol=1e-6)


def test_hep_laplacian2d_residuals():
    # non-square grid: distinct eigenvalues (a single-vector Krylov space
    # cannot reproduce multiplicities, same as the reference)
    A = st.laplacian_2d(18, 17)
    exact = st.mat.generators.laplacian_2d_eigs(18, 17)
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL, nev=4)
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(eps.eigenvalues[:4].real)[::-1]
    np.testing.assert_allclose(got, np.sort(exact)[::-1][:4], rtol=1e-8)


def test_hep_sinvert_target():
    """Interior eigenvalues via shift-and-invert."""
    n = 150
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    target = 1.0
    eps = st.EPS(A, problem_type="hep", nev=4)
    eps.set_target(target)
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(eps.eigenvalues[:4].real)
    want = np.sort(exact[np.argsort(np.abs(exact - target))][:4])
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_nhep_markov():
    """Non-symmetric Markov matrix (reference ex5.c): dominant eigenvalue 1."""
    A = st.mat.generators.markov(15)
    eps = st.EPS(A, problem_type="nhep", which=Which.LARGEST_MAGNITUDE, nev=4)
    eps.solve()
    assert eps.nconv >= 4
    lam = eps.eigenvalues[:4]
    assert abs(np.max(np.abs(lam)) - 1.0) < 1e-6
    for i in range(4):
        assert eps.compute_error(i) < 1e-6


def test_nhep_random_vs_scipy():
    rng = np.random.default_rng(3)
    n = 120
    Ad = rng.standard_normal((n, n)) / np.sqrt(n)
    A = st.DenseOperator(Ad)
    eps = st.EPS(A, problem_type="nhep", which=Which.LARGEST_MAGNITUDE,
                 nev=5, ncv=40)
    eps.solve()
    assert eps.nconv >= 5
    w = np.linalg.eigvals(Ad)
    w = w[np.argsort(-np.abs(w))]
    got = eps.eigenvalues[:5]
    # conjugate pairs at the cut boundary: compare (real, |imag|) multisets
    def canon(v):
        return np.sort_complex(np.round(v.real + 1j * np.abs(v.imag), 7))
    np.testing.assert_allclose(canon(got), canon(w[:5]), rtol=1e-5, atol=1e-8)


def test_ghep_shift():
    """Generalized Hermitian problem vs scipy.linalg.eigh."""
    import scipy.linalg as sla

    rng = np.random.default_rng(5)
    n = 80
    Ad = rng.standard_normal((n, n))
    Ad = 0.5 * (Ad + Ad.T)
    Bd = rng.standard_normal((n, n)) / np.sqrt(n)
    Bd = Bd @ Bd.T + n * np.eye(n) * 0.1
    A = st.DenseOperator(Ad)
    B = st.DenseOperator(Bd)
    eps = st.EPS(A, B, problem_type="ghep", which=Which.LARGEST_REAL, nev=4)
    eps.solve()
    assert eps.nconv >= 4
    w = sla.eigh(Ad, Bd, eigvals_only=True)
    got = np.sort(eps.eigenvalues[:4].real)[::-1]
    np.testing.assert_allclose(got, w[::-1][:4], rtol=1e-7)
    # B-orthogonality of eigenvectors
    X = eps.get_eigenvectors()[:, :4]
    G = X.conj().T @ Bd @ X
    np.testing.assert_allclose(np.diag(G).real, np.ones(4), rtol=1e-6)


def test_ghep_sinvert():
    import scipy.linalg as sla

    rng = np.random.default_rng(6)
    n = 60
    Ad = rng.standard_normal((n, n))
    Ad = 0.5 * (Ad + Ad.T)
    Bd = np.eye(n) + 0.1 * np.diag(rng.random(n))
    eps = st.EPS(st.DenseOperator(Ad), st.DenseOperator(Bd),
                 problem_type="ghep", nev=3)
    eps.set_target(0.5)
    eps.solve()
    assert eps.nconv >= 3
    w = sla.eigh(Ad, Bd, eigvals_only=True)
    want = np.sort(w[np.argsort(np.abs(w - 0.5))][:3])
    got = np.sort(eps.eigenvalues[:3].real)
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_deflation_space():
    """Deflation space excludes known eigenvectors (reference: BVInsertConstraints)."""
    n = 80
    A = st.laplacian_1d(n)
    # exact largest eigenvector of the 1-D Laplacian
    j = np.arange(1, n + 1)
    v_top = np.sin(np.pi * n * j / (n + 1))
    v_top /= np.linalg.norm(v_top)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL, nev=2)
    eps.set_deflation_space(v_top)
    eps.solve()
    got = np.sort(eps.eigenvalues[:2].real)[::-1]
    # should find the 2nd/3rd largest, not the deflated largest
    np.testing.assert_allclose(got, exact[::-1][1:3], rtol=1e-6)


def test_monitor_called():
    calls = []
    A = st.laplacian_1d(60)
    eps = st.EPS(A, problem_type="hep", nev=2)
    eps.set_monitor(lambda s, its, k, e, r: calls.append(its))
    eps.solve()
    assert len(calls) >= 1


def test_partial_reorthogonalization():
    """Omega-recurrence partial reorth (reference lanczos.c
    EPS_LANCZOS_REORTHOG_PARTIAL): same eigenvalues as full CGS2 over a
    many-restart run, and the basis keeps semi-orthogonality."""
    from slepc_tpu.mat.generators import laplacian_2d_eigs

    A = st.laplacian_2d(95, 97)
    exact = laplacian_2d_eigs(95, 97, k=6)
    eps = st.EPS(A, problem_type="hep", nev=6, ncv=28, tol=1e-9, max_it=400,
                 which=Which.SMALLEST_REAL)
    eps.set_reorthogonalization("partial")
    eps.solve()
    assert eps.nconv >= 6
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real)[:6], exact,
                               rtol=1e-7)
    # true residuals on A
    import jax.numpy as jnp

    X = eps._eigenvectors[:, :6]
    R = np.asarray(A.mult(jnp.asarray(X))) - X * eps.eigenvalues.real[None, :6]
    assert np.linalg.norm(R, axis=0).max() < 1e-8
