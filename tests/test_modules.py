"""Solver-module tests: SVD, PEP, NEP, MFN, LME.

Mirror the reference tutorials (src/svd/tutorials/ex14.c, pep ex16.c,
nep ex22.c, mfn ex23.c, lme ex32.c patterns): deterministic problems with
scipy cross-checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.linalg as sla

import slepc_tpu as st


def _rect_test_matrix(m=120, n=80, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, n)) / np.sqrt(m)


# ---------------------------------------------------------------- SVD
@pytest.mark.parametrize("solver", ["cross", "cyclic", "trlanczos", "randomized", "lapack"])
def test_svd_largest(solver):
    Ad = _rect_test_matrix()
    if solver == "randomized":
        # sketching methods assume spectral decay (their design regime);
        # impose it so the residual test is meaningful
        U0, s0, V0h = np.linalg.svd(Ad, full_matrices=False)
        Ad = (U0 * (s0 * np.exp(-0.15 * np.arange(len(s0))))) @ V0h
    A = st.DenseOperator(Ad)
    s_ref = np.linalg.svd(Ad, compute_uv=False)
    svd = st.SVD(A, nsv=5, solver=solver)
    svd.solve()
    assert svd.nconv >= 5
    # randomized is a sketching method: looser tolerance by nature
    rtol, errtol = (2e-2, 5e-2) if solver == "randomized" else (1e-6, 1e-5)
    np.testing.assert_allclose(svd.sigma[:5], s_ref[:5], rtol=rtol)
    for i in range(5):
        assert svd.compute_error(i) < errtol


def test_svd_smallest():
    Ad = _rect_test_matrix(60, 50, seed=1)
    A = st.DenseOperator(Ad)
    s_ref = np.linalg.svd(Ad, compute_uv=False)
    svd = st.SVD(A, nsv=3, which="smallest", solver="cross")
    svd.solve()
    assert svd.nconv >= 3
    np.testing.assert_allclose(np.sort(svd.sigma[:3]), np.sort(s_ref)[:3], rtol=1e-5)


def test_svd_sparse_lanczos():
    import scipy.sparse as sp

    rng = np.random.default_rng(4)
    As = sp.random(300, 200, density=0.02, random_state=rng, format="csr")
    A = st.from_scipy(As)
    s_ref = np.linalg.svd(As.toarray(), compute_uv=False)
    svd = st.SVD(A, nsv=4, solver="trlanczos")
    svd.solve()
    np.testing.assert_allclose(svd.sigma[:4], s_ref[:4], rtol=1e-6)


# ---------------------------------------------------------------- MFN
def test_mfn_expm_action():
    rng = np.random.default_rng(5)
    n = 100
    Ad = rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    y_ref = sla.expm(Ad) @ b
    mfn = st.MFN(st.DenseOperator(Ad), st.FNExp(), ncv=30)
    y = np.asarray(mfn.solve(jnp.asarray(b)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-9)


def test_mfn_expm_action_restarted():
    """Force small ncv so the Eiermann-Ernst restart engages."""
    rng = np.random.default_rng(6)
    n = 80
    Ad = rng.standard_normal((n, n)) / np.sqrt(n) - 0.5 * np.eye(n)
    b = rng.standard_normal(n)
    y_ref = sla.expm(Ad) @ b
    mfn = st.MFN(st.DenseOperator(Ad), st.FNExp(), ncv=8)
    y = np.asarray(mfn.solve(jnp.asarray(b)))
    assert mfn.its > 1
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-8)


def test_mfn_sqrt_action():
    rng = np.random.default_rng(7)
    n = 60
    Ad = rng.standard_normal((n, n))
    Ad = Ad @ Ad.T / n + 2 * np.eye(n)
    b = rng.standard_normal(n)
    y_ref = np.real(sla.sqrtm(Ad) @ b)
    mfn = st.MFN(st.DenseOperator(Ad), st.FNSqrt(), ncv=40)
    y = np.asarray(mfn.solve(jnp.asarray(b)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-6)


# ---------------------------------------------------------------- PEP
def _qep_problem(n=40, seed=8):
    """Damped mass-spring QEP (lambda^2 M + lambda C + K) x = 0."""
    rng = np.random.default_rng(seed)
    M = np.eye(n)
    C = np.diag(np.full(n, 0.4)) + np.diag(np.full(n - 1, -0.1), 1) \
        + np.diag(np.full(n - 1, -0.1), -1)
    K = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) \
        + np.diag(np.full(n - 1, -1.0), -1)
    return K, C, M


def _qep_eigs(K, C, M):
    n = K.shape[0]
    A = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    B = np.block([[np.eye(n), np.zeros((n, n))], [np.zeros((n, n)), M]])
    return sla.eigvals(A, B)


@pytest.mark.parametrize("solver", ["linear", "toar"])
def test_pep_quadratic(solver):
    K, C, M = _qep_problem()
    wref = _qep_eigs(K, C, M)
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C), st.DenseOperator(M)],
                 nev=4, solver=solver)
    pep.set_target(-0.2 + 1.0j if False else -0.2)
    pep.solve()
    assert pep.nconv >= 4
    for i in range(4):
        assert pep.compute_error(i) < 1e-7
    # each computed eigenvalue matches some reference eigenvalue
    for i in range(4):
        assert np.min(np.abs(wref - pep.eigenvalues[i])) < 1e-6


# ---------------------------------------------------------------- NEP
def _delay_nep(n=40, tau=1.0):
    """1-D delay NEP: T(lam) = -lam I + A0 + exp(-tau lam) A1
    (reference: src/nep/tutorials/ex22.c)."""
    h = np.pi / (n + 1)
    A0 = (np.diag(np.full(n, -2.0)) + np.diag(np.ones(n - 1), 1)
          + np.diag(np.ones(n - 1), -1)) / (h * h)
    xi = (np.arange(1, n + 1)) * h
    b = 4.1 - xi * (1 - np.exp(xi - np.pi))
    A0 = A0 + np.diag(b) * 0  # keep pure Laplacian part in A0
    A1 = np.diag(b)
    mats = [st.DenseOperator(-np.eye(n)), st.DenseOperator(A0), st.DenseOperator(A1)]
    fns = [st.FNRational([1.0, 0.0]),  # f(x) = x  (multiplies -I)
           st.FNRational([1.0]),  # 1
           st.FNExp()]
    fns[2].set_scale(-tau)  # exp(-tau x)
    return mats, fns


def _nep_residual(mats, fns, lam, x):
    T = sum(complex(f.eval(lam)) * np.asarray(m.A) for m, f in zip(mats, fns))
    return np.linalg.norm(T @ x) / np.linalg.norm(x)


@pytest.mark.parametrize("solver", ["slp", "rii", "narnoldi"])
def test_nep_delay(solver):
    mats, fns = _delay_nep()
    nep = st.NEP(nev=1, solver=solver, target=0.1)
    nep.set_split_operators(mats, fns)
    nep.solve()
    assert nep.nconv >= 1
    lam, x = nep.get_eigenpair(0)
    assert _nep_residual(mats, fns, complex(lam), np.asarray(x)) < 1e-8


def test_nep_interpol():
    mats, fns = _delay_nep()
    nep = st.NEP(nev=2, solver="interpol", target=0.1)
    nep.set_split_operators(mats, fns)
    nep.solve()
    assert nep.nconv >= 1
    lam, x = nep.get_eigenpair(0)
    assert _nep_residual(mats, fns, complex(lam), np.asarray(x)) < 1e-6


# ---------------------------------------------------------------- LME
def test_lme_lyapunov_lowrank():
    rng = np.random.default_rng(10)
    n = 60
    # stable A
    Ad = -np.eye(n) * 2 + np.diag(np.ones(n - 1), 1) * 0.5 \
        + np.diag(np.ones(n - 1), -1) * 0.4
    C1 = rng.standard_normal((n, 2))
    lme = st.LME(st.DenseOperator(Ad), ncv=30, tol=1e-9)
    Z = lme.solve(C1)
    res = lme.compute_residual(Z, C1)
    assert res < 1e-6
    # cross-check vs dense scipy solve
    X_ref = sla.solve_lyapunov(Ad, -C1 @ C1.T)
    np.testing.assert_allclose(Z @ Z.T, X_ref, atol=1e-6)


def test_lme_sylvester_dense():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((20, 20)) - 3 * np.eye(20)
    B = rng.standard_normal((15, 15)) + 3 * np.eye(15)
    C = rng.standard_normal((20, 15))
    lme = st.LME(st.DenseOperator(A), B=st.DenseOperator(B),
                 problem_type="sylvester")
    X = lme.solve(C)
    np.testing.assert_allclose(A @ X + X @ B + C, np.zeros_like(C), atol=1e-9)


def test_lme_gen_lyapunov():
    """Generalized Lyapunov A X E^T + E X A^T + C C^T = 0 via reduction
    to standard form (reference LME_GEN_LYAPUNOV)."""
    from slepc_tpu.lme.lme import LME

    rng = np.random.default_rng(0)
    n = 50
    Ad = -2 * np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    Ed = np.eye(n) + 0.1 * rng.standard_normal((n, n)) / np.sqrt(n)
    C1 = rng.standard_normal((n, 2))
    lme = LME(st.DenseOperator(Ad), B=st.DenseOperator(Ed),
              problem_type="gen_lyapunov", ncv=40, tol=1e-10)
    Z = lme.solve(C1)
    X = Z @ Z.T
    R = Ad @ X @ Ed.T + Ed @ X @ Ad.T + C1 @ C1.T
    assert np.linalg.norm(R) / np.linalg.norm(C1 @ C1.T) < 1e-8


def test_lme_sylvester_krylov():
    """Large-scale Sylvester via two-sided Krylov projection."""
    import scipy.sparse as sp
    from slepc_tpu.lme.lme import LME

    rng = np.random.default_rng(0)
    n2, m2 = 700, 650
    A2 = st.from_scipy(sp.diags([-np.ones(n2 - 1), -3 * np.ones(n2),
                                 -np.ones(n2 - 1)], [-1, 0, 1]).tocsr())
    B2 = st.from_scipy(sp.diags([np.ones(m2 - 1), 8 * np.ones(m2),
                                 np.ones(m2 - 1)], [-1, 0, 1]).tocsr())
    c1 = rng.standard_normal((n2, 1))
    c2 = rng.standard_normal((m2, 1))
    lme2 = LME(A2, B=B2, problem_type="sylvester", ncv=40)
    L, R2 = lme2.solve(c1, c2)
    X2 = L @ R2.T
    Rres = np.asarray(A2.to_scipy() @ X2) + X2 @ np.asarray(
        B2.to_scipy().toarray()) + c1 @ c2.T
    assert np.linalg.norm(Rres) / np.linalg.norm(c1 @ c2.T) < 1e-10
