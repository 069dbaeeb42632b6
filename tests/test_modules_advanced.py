"""Advanced module solvers: NEP ciss/nleigs, PEP jd/ciss, SVD gsvd/hsvd."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.linalg as sla

import slepc_tpu as st


def _delay_problem(n=40, tau=1.0):
    h = np.pi / (n + 1)
    A0 = (np.diag(np.full(n, -2.0)) + np.diag(np.ones(n - 1), 1)
          + np.diag(np.ones(n - 1), -1)) / (h * h)
    xi = np.arange(1, n + 1) * h
    b = 4.1 - xi * (1 - np.exp(xi - np.pi))
    A1 = np.diag(b)
    mats = [st.DenseOperator(-np.eye(n)), st.DenseOperator(A0), st.DenseOperator(A1)]
    fns = [st.FNRational([1.0, 0.0]), st.FNRational([1.0]), st.FNExp()]
    fns[2].set_scale(-tau)
    return mats, fns


def _nep_res(mats, fns, lam, x):
    T = sum(complex(f.eval(lam)) * np.asarray(m.A) for m, f in zip(mats, fns))
    return np.linalg.norm(T @ x) / np.linalg.norm(x)


@pytest.mark.parametrize("solver", ["ciss", "nleigs"])
def test_nep_region_solvers(solver):
    mats, fns = _delay_problem()
    nep = st.NEP(nev=3, solver=solver, target=-1.0, tol=1e-10)
    nep.set_split_operators(mats, fns)
    nep.set_rg(st.RGEllipse(center=-1.0, radius=1.5, vscale=0.5))
    nep.solve()
    assert nep.nconv >= 2
    # the known eigenvalue -0.19002 must be among the found ones
    assert np.min(np.abs(nep.eigenvalues[: nep.nconv] + 0.19002334)) < 1e-6
    for i in range(nep.nconv):
        lam, x = nep.get_eigenpair(i)
        assert _nep_res(mats, fns, complex(lam), np.asarray(x)) < 1e-8


def _qep():
    n = 30
    K = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) \
        + np.diag(np.full(n - 1, -1.0), -1)
    C = np.eye(n) * 0.4
    M = np.eye(n)
    Abig = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    wref = np.linalg.eigvals(Abig)
    return K, C, M, wref


def test_pep_jd():
    K, C, M, wref = _qep()
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C), st.DenseOperator(M)],
                 nev=2, solver="jd", max_it=300)
    pep.set_target(-0.2)
    pep.solve()
    assert pep.nconv >= 2
    for i in range(2):
        assert pep.compute_error(i) < 1e-7
        assert np.min(np.abs(wref - pep.eigenvalues[i])) < 1e-6


def test_pep_ciss():
    K, C, M, wref = _qep()
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C), st.DenseOperator(M)],
                 nev=2, solver="ciss")
    pep.set_target(-0.2)
    pep.set_rg(st.RGEllipse(center=-0.2, radius=0.4))
    pep.solve()
    assert pep.nconv >= 2
    for i in range(2):
        assert pep.compute_error(i) < 1e-7
        assert np.min(np.abs(wref - pep.eigenvalues[i])) < 1e-6


def test_svd_gsvd():
    rng = np.random.default_rng(0)
    m, p, n = 50, 40, 30
    Ad = rng.standard_normal((m, n))
    Bd = rng.standard_normal((p, n))
    lam = sla.eigh(Ad.T @ Ad, Bd.T @ Bd, eigvals_only=True)
    sig_ref = np.sqrt(np.sort(lam)[::-1])
    svd = st.SVD(st.DenseOperator(Ad), B=st.DenseOperator(Bd), nsv=3)
    svd.solve()
    assert svd.nconv >= 3
    np.testing.assert_allclose(svd.sigma[:3], sig_ref[:3], rtol=1e-6)
    for i in range(3):
        x = svd.X[:, i]
        r = Ad.T @ (Ad @ x) - svd.sigma[i] ** 2 * (Bd.T @ (Bd @ x))
        assert np.linalg.norm(r) / np.linalg.norm(x) < 1e-6


def test_svd_hsvd():
    rng = np.random.default_rng(0)
    m, n = 40, 25
    Ad = rng.standard_normal((m, n))
    om = np.sign(rng.standard_normal(m))
    om[0] = 1
    M = Ad.T @ (om[:, None] * Ad)
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    sig_ref = np.sqrt(np.sort(np.abs(w))[::-1])
    svd = st.SVD(st.DenseOperator(Ad), omega=om, nsv=3)
    svd.solve()
    assert svd.nconv >= 3
    np.testing.assert_allclose(svd.sigma[:3], sig_ref[:3], rtol=1e-6)
    # hyperbolic orthogonality: U^T Omega U = diag(signs)
    G = svd.U[:, :3].T @ (om[:, None] * svd.U[:, :3])
    np.testing.assert_allclose(np.diag(G), svd.sign[:3], atol=1e-6)


def test_nep_two_sided_resolvent():
    """Left eigenvectors and resolvent action (reference nepresolv.c)."""
    mats, fns = _delay_problem()
    nep = st.NEP(nev=2, solver="ciss", target=-1.0, tol=1e-10)
    nep.set_split_operators(mats, fns)
    nep.set_rg(st.RGEllipse(center=-1.0, radius=1.5, vscale=0.5))
    nep.set_two_sided()
    nep.solve()
    assert nep.nconv >= 2
    lam0, x0 = nep.get_eigenpair(0)
    y0 = nep.get_left_eigenvector(0)
    T = sum(complex(f.eval(lam0)) * np.asarray(m.A) for m, f in zip(mats, fns))
    assert np.linalg.norm(y0.conj() @ T) / np.linalg.norm(y0) < 1e-8
    # resolvent near the pole aligns with the right eigenvector
    v = np.random.default_rng(0).standard_normal(mats[0].shape[0])
    Rv = nep.apply_resolvent(complex(lam0) + 1e-4, v)
    c = np.abs(np.vdot(x0, Rv)) / (np.linalg.norm(Rv) * np.linalg.norm(x0))
    assert c > 0.99


def test_pep_stoar_overdamped():
    """STOAR: symmetric pseudo-Lanczos on the symmetric linearization
    (reference stoar.c) — overdamped/hyperbolic QEP, all-real spectrum."""
    n = 60
    K = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) \
        + np.diag(np.full(n - 1, -1.0), -1)
    C = 10 * np.eye(n) + 0.5 * (np.diag(np.full(n - 1, 1.0), 1)
                                + np.diag(np.full(n - 1, 1.0), -1))
    M = np.eye(n)
    Ab = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    wref = np.linalg.eigvals(Ab)
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C),
                  st.DenseOperator(M)], nev=4, solver="stoar")
    pep.set_target(-0.4)
    pep.solve()
    assert pep.nconv >= 4
    for i in range(4):
        assert pep.compute_error(i) < 1e-8
        assert np.min(np.abs(wref - pep.eigenvalues[i])) < 1e-8


def test_pep_chebyshev_basis():
    """Non-monomial polynomial bases (reference pepimpl.h pbc):
    Chebyshev-basis coefficients converted exactly."""
    rng = np.random.default_rng(0)
    n = 30
    B0 = rng.standard_normal((n, n))
    B0 = B0 + B0.T + 8 * np.eye(n)
    B1 = 0.2 * np.eye(n)
    B2 = np.eye(n)
    # T0=1, T1=x, T2=2x^2-1 -> monomial A0=B0-B2, A1=B1, A2=2B2
    A0, A1, A2 = B0 - B2, B1, 2 * B2
    Ab = np.block([[np.zeros((n, n)), np.eye(n)],
                   [-np.linalg.solve(A2, A0), -np.linalg.solve(A2, A1)]])
    wref = np.linalg.eigvals(Ab)
    pep = st.PEP([st.DenseOperator(B0), st.DenseOperator(B1),
                  st.DenseOperator(B2)], nev=4, solver="toar",
                 basis="chebyshev")
    pep.set_target(1.5)
    pep.solve()
    assert pep.nconv >= 4
    for i in range(4):
        assert np.min(np.abs(wref - pep.eigenvalues[i])) < 1e-8


def test_svd_gsvd_jbd_smallest_and_conditioning():
    """JBD GSVD (reference trlanczos.c GUpper): converges the smallest
    generalized singular values too, on a pair where the cross-pencil
    formulation squares the conditioning."""
    rng = np.random.default_rng(3)
    m, p, n = 60, 50, 35
    # moderately ill-conditioned A
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    Vt, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sv = np.logspace(0, -5, n)
    Ad = U @ np.diag(sv) @ Vt.T
    Bd = rng.standard_normal((p, n))
    lam = sla.eigh(Ad.T @ Ad, Bd.T @ Bd, eigvals_only=True)
    sig_ref = np.sqrt(np.maximum(np.sort(lam)[::-1], 0))
    svd = st.SVD(st.DenseOperator(Ad), B=st.DenseOperator(Bd), nsv=3,
                 ncv=20)
    svd.solve()
    assert svd.nconv >= 3
    np.testing.assert_allclose(svd.sigma[:3], sig_ref[:3], rtol=1e-5)
    # smallest gsv on a well-conditioned pair (like the reference, the
    # Lanczos route does not resolve the smallest of an ill-conditioned A
    # without inversion)
    A2 = rng.standard_normal((m, n))
    lam2 = sla.eigh(A2.T @ A2, Bd.T @ Bd, eigvals_only=True)
    sref2 = np.sqrt(np.maximum(np.sort(lam2), 0))
    svd2 = st.SVD(st.DenseOperator(A2), B=st.DenseOperator(Bd), nsv=2,
                  ncv=20, which="smallest", max_it=80)
    svd2.solve()
    assert svd2.nconv >= 2
    np.testing.assert_allclose(np.sort(svd2.sigma[:2]), sref2[:2], rtol=1e-5)


def test_pep_refine_multiple():
    """Invariant-pair ('multiple') refinement handles a clustered pair
    that per-pair Newton cannot separate (reference PEP_REFINE_MULTIPLE)."""
    n = 30
    rng = np.random.default_rng(1)
    K = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) \
        + np.diag(np.full(n - 1, -1.0), -1)
    C = 0.3 * np.eye(n)
    M = np.eye(n)
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C),
                  st.DenseOperator(M)], nev=4, solver="toar")
    pep.set_target(-0.15 + 1.0j)
    pep.solve()
    assert pep.nconv >= 4
    # perturb the converged pairs, then recover with multiple refinement
    pep.eigenvalues = pep.eigenvalues.astype(complex)
    pep._eigenvectors = pep._eigenvectors.astype(complex)
    lam_good = pep.eigenvalues[:4].copy()
    pep.eigenvalues[:4] *= (1 + 1e-5)
    pep._eigenvectors[:, :4] += 1e-5 * (
        rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4)))
    pep.refine(steps=3, scheme="multiple")
    for i in range(4):
        lam, x = pep.get_eigenpair(i)
        r = (K + lam * C + lam ** 2 * M) @ x
        assert np.linalg.norm(r) / np.linalg.norm(x) < 1e-10
    for lam in lam_good:
        assert np.min(np.abs(pep.eigenvalues[:4] - lam)) < 1e-8 * abs(lam)


def test_nep_effenberger_deflation_multiple():
    """Effenberger invariant-pair deflation finds a DOUBLE eigenvalue's
    full eigenspace, where orthogonal-projection deflation cannot
    re-approach the same eigenvalue (reference: nepdefl.c)."""
    # T(lam) = A - lam I with A having a double eigenvalue 2.0
    n = 20
    rng = np.random.default_rng(0)
    D = np.diag(np.concatenate([[2.0, 2.0], 4.0 + np.arange(n - 2.0)]))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Ad = Q @ D @ Q.T
    mats = [st.DenseOperator(Ad), st.DenseOperator(np.eye(n))]
    fns = [st.FNRational([1.0]), st.FNRational([-1.0, 0.0])]
    nep = st.NEP(nev=2, solver="slp", target=1.8, tol=1e-10, max_it=60)
    nep.set_split_operators(mats, fns)
    nep.solve()
    assert nep.nconv >= 2
    lams = nep.eigenvalues[:2]
    np.testing.assert_allclose(sorted(lams.real), [2.0, 2.0], atol=1e-8)
    X = nep._eigenvectors[:, :2]
    # the two vectors span a 2-D eigenspace (not the same vector twice)
    s = np.linalg.svd(X, compute_uv=False)
    assert s[1] > 1e-3


def test_pep_qslice_interval():
    """QSlice: all eigenvalues of a hyperbolic QEP in an interval, with
    inertia certificates on P(sigma) (reference: stoar/qslice.c)."""
    n = 40
    # hyperbolic QEP: M=I, K SPD, C large SPD (overdamped => hyperbolic)
    rng = np.random.default_rng(0)
    K = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) \
        + np.diag(np.full(n - 1, -1.0), -1)
    C = np.diag(5.0 + rng.random(n))
    M = np.eye(n)
    # reference eigenvalues from the dense linearization
    Abig = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    w = np.linalg.eigvals(Abig)
    assert np.abs(w.imag).max() < 1e-10  # hyperbolic: all real
    wr = np.sort(w.real)
    a, b = -0.9, -0.3
    inside = wr[(wr > a) & (wr < b)]
    pep = st.PEP([st.DenseOperator(K), st.DenseOperator(C),
                  st.DenseOperator(M)], solver="stoar", tol=1e-9)
    pep.set_interval(a, b)
    pep.solve()
    assert pep.nconv == len(inside)
    np.testing.assert_allclose(np.sort(pep.eigenvalues), inside, rtol=1e-7)


def test_nep_nleigs_compact_vs_fullbasis():
    """The compact (TOAR-style) NLEIGS default agrees with the full-basis
    option (reference nleigs.c default vs nleigs-fullb.c); the compact
    basis memory is independent of the interpolation degree d."""
    mats, fns = _delay_problem()
    res = {}
    for full in (False, True):
        nep = st.NEP(nev=3, solver="nleigs", target=-1.0, tol=1e-10)
        nep.nleigs_full_basis = full
        nep.set_split_operators(mats, fns)
        nep.set_rg(st.RGEllipse(center=-1.0, radius=1.5, vscale=0.5))
        nep.solve()
        assert nep.nconv >= 2
        res[full] = np.sort_complex(nep.eigenvalues[:2])
        for i in range(nep.nconv):
            lam, x = nep.get_eigenpair(i)
            assert _nep_res(mats, fns, complex(lam), np.asarray(x)) < 1e-8
    np.testing.assert_allclose(res[False], res[True], rtol=1e-7)
