"""Cross-solver EPS tests: every registered algorithm on the same problems.

Mirrors the reference's src/eps/tests/test1.c pattern: one testset looping
over solver types against one expected output.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import slepc_tpu as st
from slepc_tpu.sys.sort import Which


def _sym_problem(n=120, seed=0):
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    return A, exact


def _gapped_problem(n=120, seed=0):
    """Symmetric matrix with geometrically decaying spectrum (a regime
    where single-vector/subspace iteration converges fast)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = 3.0 * 0.8 ** np.arange(n)
    Ad = (Q * w) @ Q.T
    return st.DenseOperator(Ad), np.sort(w)[::-1]


@pytest.mark.parametrize("solver", ["krylovschur", "arnoldi", "lanczos", "lapack"])
def test_hep_largest_all_solvers(solver):
    A, exact = _sym_problem()
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL, nev=4,
                 solver=solver, ncv=30)
    eps.solve()
    assert eps.nconv >= 4, f"{solver}: nconv={eps.nconv}"
    got = np.sort(eps.eigenvalues[:4].real)[::-1]
    np.testing.assert_allclose(got, exact[::-1][:4], rtol=1e-6,
                               err_msg=f"solver={solver}")


def test_hep_subspace_gapped():
    A, exact = _gapped_problem()
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL, nev=3,
                 solver="subspace", ncv=16, max_it=500)
    eps.solve()
    assert eps.nconv >= 3
    got = np.sort(eps.eigenvalues[:3].real)[::-1]
    np.testing.assert_allclose(got, exact[:3], rtol=1e-6)


@pytest.mark.parametrize("solver", ["lobpcg", "gd", "jd"])
def test_hep_smallest_precond_solvers(solver):
    n = 100
    A, exact = _sym_problem(n)
    eps = st.EPS(A, problem_type="hep", which=Which.SMALLEST_REAL, nev=3,
                 solver=solver, ncv=30, max_it=3000, tol=1e-7)
    eps.set_st(st.STPrecond([A.shifted(0.0)]))
    eps.solve()
    assert eps.nconv >= 3, f"{solver}: nconv={eps.nconv}"
    got = np.sort(eps.eigenvalues[:3].real)
    np.testing.assert_allclose(got, exact[:3], rtol=1e-5,
                               err_msg=f"solver={solver}")


def test_hep_rqcg():
    n = 100
    A, exact = _sym_problem(n)
    eps = st.EPS(A, problem_type="hep", which=Which.SMALLEST_REAL, nev=2,
                 solver="rqcg", max_it=6000, tol=1e-6)
    eps.solve()
    assert eps.nconv >= 2
    got = np.sort(eps.eigenvalues[:2].real)
    np.testing.assert_allclose(got, exact[:2], rtol=1e-3)


def test_power_largest():
    A, exact = _gapped_problem(80)
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_MAGNITUDE, nev=2,
                 solver="power", max_it=5000, tol=1e-9)
    eps.solve()
    assert eps.nconv >= 2
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:2].real)[::-1],
                               exact[:2], rtol=1e-6)


def test_power_inverse_iteration():
    """power + sinvert = inverse iteration toward the target."""
    A, exact = _sym_problem(80)
    target = 1.01  # not an exact eigenvalue (1.0 is, for n=80)
    eps = st.EPS(A, problem_type="hep", nev=1, solver="power", max_it=2000)
    eps.set_target(target)
    eps.solve()
    assert eps.nconv >= 1
    want = exact[np.argmin(np.abs(exact - target))]
    np.testing.assert_allclose(eps.eigenvalues[0].real, want, rtol=1e-7)


@pytest.mark.parametrize("solver", ["krylovschur", "arnoldi", "lapack"])
def test_nhep_all_solvers(solver):
    rng = np.random.default_rng(1)
    n = 80
    Ad = rng.standard_normal((n, n)) / np.sqrt(n)
    A = st.DenseOperator(Ad)
    w = np.linalg.eigvals(Ad)
    w = w[np.argsort(-np.abs(w))]
    eps = st.EPS(A, problem_type="nhep", which=Which.LARGEST_MAGNITUDE,
                 nev=3, solver=solver, ncv=30)
    eps.solve()
    assert eps.nconv >= 3, f"{solver}: nconv={eps.nconv}"
    for lam in eps.eigenvalues[:3]:
        assert np.min(np.abs(w - lam)) < 1e-5, f"solver={solver} lam={lam}"


def test_filter_interval():
    """Polynomial-filtered Krylov run retrieves interior eigenvalues
    without factorization (STFILTER role)."""
    n = 200
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    a, b = 1.0, 1.2
    inside = exact[(exact >= a) & (exact <= b)]
    flt = st.STFilter([A], interval=(a, b), degree=150, spectral_range=(0.0, 4.0))
    eps = st.EPS(A, problem_type="hep", which=Which.LARGEST_REAL,
                 nev=min(len(inside), 5), ncv=40, tol=1e-6)
    eps.set_st(flt)
    eps.solve()
    assert eps.nconv >= 3
    got = np.sort(eps.eigenvalues[: eps.nconv].real)
    # every reported value must be an eigenvalue inside (or near) the interval
    for g in got[:3]:
        assert np.min(np.abs(exact - g)) < 1e-5
        assert a - 0.05 <= g <= b + 0.05
