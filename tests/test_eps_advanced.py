"""Advanced EPS features: spectrum slicing, CISS, two-sided, lyapii, BSE."""

import numpy as np
import pytest
import jax.numpy as jnp

import slepc_tpu as st
from slepc_tpu.sys.sort import Which


def test_spectrum_slicing():
    """EPS_ALL on an interval with inertia certification
    (reference: ks-slice.c)."""
    n = 100
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    a, b = 0.5, 0.8
    inside = np.sort(exact[(exact > a) & (exact < b)])
    eps = st.EPS(A, problem_type="hep")
    eps.set_interval(a, b)
    eps.solve()
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside, rtol=1e-7)


def test_slicing_generalized():
    rng = np.random.default_rng(0)
    n = 60
    Ad = rng.standard_normal((n, n))
    Ad = 0.5 * (Ad + Ad.T)
    Bd = np.eye(n) + 0.05 * np.diag(rng.random(n))
    import scipy.linalg as sla

    w = sla.eigh(Ad, Bd, eigvals_only=True)
    a, b = -1.0, 1.0
    inside = np.sort(w[(w > a) & (w < b)])
    eps = st.EPS(st.DenseOperator(Ad), st.DenseOperator(Bd), problem_type="ghep")
    eps.set_interval(a, b)
    eps.solve()
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside, rtol=1e-6)


def test_ciss_ellipse():
    """Contour-integral solver finds all eigenvalues in an ellipse
    (reference: ciss.c)."""
    n = 100
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", solver="ciss", tol=1e-9)
    eps.set_rg(st.RGEllipse(center=0.65, radius=0.16, vscale=0.3))
    eps.solve()
    inside = np.sort(exact[np.abs(exact - 0.65) < 0.16])
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside, rtol=1e-8)


def test_ciss_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 60
    Ad = rng.standard_normal((n, n)) / np.sqrt(n)
    w = np.linalg.eigvals(Ad)
    c, r = 0.3, 0.35
    inside = w[np.abs(w - c) < r]
    eps = st.EPS(st.DenseOperator(Ad), problem_type="nhep", solver="ciss",
                 tol=1e-8)
    eps.set_rg(st.RGEllipse(center=c, radius=r))
    eps.solve()
    assert eps.nconv >= len(inside) - 1  # boundary-grazing pairs may drop
    for lam in eps.eigenvalues[: eps.nconv]:
        assert np.min(np.abs(w - lam)) < 1e-6


def test_two_sided():
    """Left eigenvectors: y^H A = lambda y^H (reference: ks-twosided.c)."""
    rng = np.random.default_rng(2)
    n = 60
    Ad = rng.standard_normal((n, n)) / np.sqrt(n)
    eps = st.EPS(st.DenseOperator(Ad), problem_type="nhep", nev=3,
                 which=Which.LARGEST_MAGNITUDE)
    eps.set_two_sided()
    eps.solve()
    assert eps.nconv >= 3
    for i in range(3):
        lam = eps.eigenvalues[i]
        y = eps.get_left_eigenvector(i)
        r = y.conj() @ Ad - lam * y.conj()
        assert np.linalg.norm(r) < 1e-6


def test_lyapii_rightmost():
    """Rightmost eigenvalue of a stable matrix via Lyapunov inverse
    iteration (reference: lyapii.c).  The method converges at the linear
    rate Re(l1+l1)/Re(l1+l2), so the test matrix has a well-separated
    rightmost eigenvalue (the reference's use case: stability analysis
    where the critical mode is isolated)."""
    rng = np.random.default_rng(3)
    n = 50
    d = -np.concatenate([[0.4], 2.0 + rng.random(n - 1) * 3])
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    Ad = Q @ np.diag(d) @ Q.T + 0.05 * rng.standard_normal((n, n)) / np.sqrt(n)
    w = np.linalg.eigvals(Ad)
    rightmost = w[np.argmax(w.real)]
    eps = st.EPS(st.DenseOperator(Ad), problem_type="nhep", solver="lyapii",
                 nev=1, tol=1e-8, max_it=80)
    eps.solve()
    assert eps.nconv >= 1
    got = eps.eigenvalues[0]
    assert abs(got.real - rightmost.real) < 1e-6
    assert abs(abs(np.imag(got)) - abs(rightmost.imag)) < 1e-6


def test_bse_structure():
    """Structure-preserving BSE solve (reference: ks-bse.c, Shao variant)."""
    rng = np.random.default_rng(4)
    n = 40
    R = rng.standard_normal((n, n))
    R = 0.5 * (R + R.T) + 2.5 * n ** 0.5 * np.eye(n)  # R +- C SPD
    C = rng.standard_normal((n, n))
    C = 0.5 * (C + C.T)
    H = st.create_bse(st.DenseOperator(R), st.DenseOperator(C))
    Hd = np.block([[R, C], [-C, -R]])
    w = np.linalg.eigvals(Hd)
    pos = np.sort(w.real[w.real > 1e-8])
    eps = st.EPS(H, problem_type="bse", nev=4, tol=1e-9)
    eps.solve()
    assert eps.nconv >= 4
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real), pos[:4],
                               rtol=1e-7)
    # eigenvector residual on the full H
    for i in range(4):
        lam, z = eps.get_eigenpair(i)
        r = Hd @ z - lam * z
        assert np.linalg.norm(r) < 1e-6


def test_bse_complex_structure():
    """Complex definite BSE: structure-preserving M-metric solve
    (reference: ks-bse.c Gruning variant role)."""
    rng = np.random.default_rng(7)
    n = 30
    R = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    R = 0.5 * (R + R.conj().T) + 3.0 * n ** 0.5 * np.eye(n)
    C = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    C = 0.5 * (C + C.T)  # complex symmetric
    H = st.create_bse(st.DenseOperator(R), st.DenseOperator(C))
    Hd = np.block([[R, C], [-C.conj(), -R.conj()]])
    w = np.linalg.eigvals(Hd)
    pos = np.sort(w.real[w.real > 1e-8])
    eps = st.EPS(H, problem_type="bse", nev=4, tol=1e-9)
    eps.solve()
    assert eps.nconv >= 4
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real), pos[:4],
                               rtol=1e-7)
    for i in range(4):
        lam, z = eps.get_eigenpair(i)
        assert np.imag(lam) == 0
        assert np.linalg.norm(Hd @ z - lam * z) < 1e-6


def test_krylov_balance():
    """Matrix-free Chen-Demmel balancing improves accuracy on badly
    scaled non-normal matrices (reference EPSSetBalance)."""
    rng = np.random.default_rng(0)
    n = 80
    D = np.diag(10.0 ** rng.uniform(-3, 3, n))
    M0 = rng.standard_normal((n, n)) / np.sqrt(n)
    Ad = np.linalg.solve(D, M0) @ D  # similar to M0, horribly scaled
    w_ref = np.linalg.eigvals(M0)
    eps = st.EPS(st.DenseOperator(Ad), problem_type="nhep", nev=3, ncv=40,
                 max_it=300)
    eps.set_balance()
    eps.solve()
    assert eps.nconv >= 3
    for lam in eps.eigenvalues[:3]:
        assert np.min(np.abs(w_ref - lam)) < 1e-7


def test_ciss_hankel_extraction():
    """Block-Hankel (Beyn) extraction variant of CISS
    (reference EPS_CISS_EXTRACTION_HANKEL)."""
    n = 100
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", solver="ciss", tol=1e-9)
    eps.ciss_extraction = "hankel"
    eps.set_rg(st.RGEllipse(center=0.65, radius=0.16, vscale=0.3))
    eps.solve()
    inside = np.sort(exact[np.abs(exact - 0.65) < 0.16])
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside, rtol=1e-7)


def test_harmonic_extraction_hep():
    """Harmonic Ritz on a mild interior target, plain shift (reference
    EPS_HARMONIC + DSTranslateHarmonic path, krylovschur.c:271,312)."""
    import scipy.sparse as sp

    n = 300
    A = sp.diags(np.arange(1.0, n + 1)).tocsr()
    op = st.from_scipy(A)
    eps = st.EPS()
    eps.set_operators(op)
    eps.set_problem_type("hep")
    eps.set_dimensions(nev=4, ncv=24)
    eps.set_target(4.8)
    eps.set_st(st.STShift([op]))
    eps.set_which(Which.TARGET_MAGNITUDE)
    eps.set_extraction("harmonic")
    eps.set_tolerances(tol=1e-8, max_it=100)
    eps.solve()
    assert eps.nconv >= 4
    got = eps.eigenvalues.real
    # every converged value is a true eigenvalue (an integer 1..n)
    np.testing.assert_allclose(got, np.round(got), atol=1e-6)
    # the two nearest-to-target eigenvalues are among them
    assert {4.0, 5.0} <= set(np.round(got))


def test_harmonic_extraction_nhep_pairs():
    """Harmonic extraction through the real-Schur (conjugate-pair) path."""
    import scipy.linalg as sla

    rng = np.random.default_rng(7)
    n = 300
    re = np.arange(1.0, n // 2 + 1)
    im = 0.4 * rng.standard_normal(n // 2)
    blocks = [np.array([[a, b], [-b, a]]) for a, b in zip(re, im)]
    D = sla.block_diag(*blocks)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Ad = Q @ D @ Q.T
    ew = np.concatenate([re + 1j * im, re - 1j * im])
    eps = st.EPS()
    op = st.from_dense(Ad)
    eps.set_operators(op)
    eps.set_problem_type("nhep")
    eps.set_dimensions(nev=4, ncv=24)
    eps.set_target(4.8)
    eps.set_st(st.STShift([op]))
    eps.set_which(Which.TARGET_MAGNITUDE)
    eps.set_extraction("harmonic")
    eps.set_tolerances(tol=1e-8, max_it=300)
    eps.solve()
    assert eps.nconv >= 4
    for lam in eps.eigenvalues[:4]:
        assert np.min(np.abs(ew - lam)) < 1e-6


def test_power_nonlinear_spi():
    """Nonlinear inverse power iteration A(x) x = lambda x (reference:
    EPSPowerSetNonlinear, power.c) on a Gross-Pitaevskii-type toy:
    A(x) = Laplacian + g*diag(x^2)."""
    n = 80
    A0 = st.laplacian_1d(n)
    A0d = np.asarray(A0.to_dense())
    g = 0.5  # weak-interaction regime (strong coupling needs Newton/SNES)

    def A_of_x(x):
        return st.DenseOperator(A0d + g * np.diag(np.abs(np.asarray(x)) ** 2))

    eps = st.EPS(A0, problem_type="hep", nev=1)
    eps.set_tolerances(tol=1e-9, max_it=200)
    eps.set_power_nonlinear(A_of_x)
    eps.solve()
    assert eps.nconv == 1
    lam, x = eps.get_eigenpair(0)
    r = (A0d + g * np.diag(np.abs(x) ** 2)) @ x - lam.real * x
    assert np.linalg.norm(r) < 1e-7
    assert lam.real > 0


def test_spectrum_slicing_partitions():
    """Slicing with npart concurrent partitions (reference:
    EPSKrylovSchurSetPartitions / subcommunicator slicing, ks-slice.c)."""
    n = 120
    A = st.laplacian_1d(n)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    a, b = 0.4, 1.1
    inside = np.sort(exact[(exact > a) & (exact < b)])
    eps = st.EPS(A, problem_type="hep")
    eps.set_interval(a, b)
    eps.slice_npart = 4
    eps.solve()
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside,
                               rtol=1e-7)


def test_gd_harmonic_target():
    """GD with harmonic extraction on an interior target (reference:
    test30 — diag(1..n), target 4.8, -eps_harmonic with a Davidson
    solver; expected pairs 5, 4, 6, 3)."""
    n = 100
    Ad = np.diag(np.arange(1.0, n + 1))
    eps = st.EPS(st.DenseOperator(Ad), problem_type="hep", solver="gd",
                 nev=4, ncv=20, max_it=600, tol=1e-9)
    eps.set_target(4.8)
    eps.set_st(st.STPrecond([st.DenseOperator(Ad)], sigma=4.8))
    eps.set_which(Which.TARGET_MAGNITUDE)
    eps.set_extraction("harmonic")
    eps.solve()
    assert eps.nconv >= 4
    got = set(np.round(eps.eigenvalues[:4].real).astype(int))
    assert {4, 5} <= got
    for lam in eps.eigenvalues[:4].real:
        assert abs(lam - round(lam)) < 1e-7


def test_bse_projected_variant():
    """ProjectedBSE variant (reference ks-bse.c:403-723): half-size
    two-basis Lanczos with the pseudo-inner-product orthogonalization;
    agrees with the Gruning (M-metric) route on a complex definite BSE."""
    rng = np.random.default_rng(0)
    n = 60
    Q = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    R = Q @ Q.conj().T / n + 3 * np.eye(n)
    C = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    C = (C + C.T) * (0.5 / n)
    Hd = np.block([[R, C], [-C.conj(), -R.conj()]])
    wd = np.sort(np.linalg.eigvals(Hd).real)
    pos = wd[wd > 1e-10]
    H = st.create_bse(st.DenseOperator(R), st.DenseOperator(C))
    eps = st.EPS(H, solver="bse", nev=4, ncv=24, tol=1e-9, max_it=300)
    eps.bse_variant = "projected"
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(eps.eigenvalues[:4].real)
    np.testing.assert_allclose(got, pos[:4], rtol=1e-9)
    assert eps.errests[:4].max() < 1e-8
    # eigenvector residuals on the full 2n Hamiltonian
    Z = eps._eigenvectors[:, :4]
    res = np.linalg.norm(Hd @ Z - Z * eps.eigenvalues[:4][None, :], axis=0)
    assert res.max() < 1e-8
