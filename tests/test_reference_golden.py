"""Golden values from the reference's expected outputs.

The reference CI asserts digit-exact eigenvalues (DIFF_NUMBERS policy,
README-devel.md:23-26).  These tests reproduce headline expected values:
src/eps/tests/output/test1_1.out — GHEP on the 2-D Laplacian pair
(N=324, 18x18 grid): 21.89996, 21.65898, 21.28794, 20.82229.
"""

import numpy as np
import pytest

import slepc_tpu as st
from slepc_tpu.sys.sort import Which


def test_ghep_reference_test1_digits():
    """Exact reproduction of the reference's src/eps/tests/test1.c GHEP:
    A = 5-point Laplacian on an 18x18 grid, B = diag(2/log(II+2)).
    Published expected values (src/eps/tests/output/test1_1.out):
    21.89996, 21.65898, 21.28794, 20.82229 — matched to all 5 printed
    decimals."""
    m = 18
    N = m * m
    A = st.laplacian_2d(m, m)
    from slepc_tpu.mat.linop import DiagonalOperator

    d = 2.0 / np.log(np.arange(N) + 2.0)
    B = DiagonalOperator(d)
    eps = st.EPS(A, B, problem_type="ghep", which=Which.LARGEST_MAGNITUDE,
                 nev=4)
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(eps.eigenvalues[:4].real)[::-1]
    want = [21.89996, 21.65898, 21.28794, 20.82229]
    np.testing.assert_allclose(np.round(got, 5), want, atol=1.1e-5)
    # B-orthonormality (the property test1.c verifies)
    X = eps.get_eigenvectors()[:, :4]
    G = X.T @ (d[:, None] * X)
    np.testing.assert_allclose(G, np.eye(4), atol=1e-7)


def test_ex1_output_digits():
    """ex1-style run printing 5-digit eigenvalues of the 1-D Laplacian
    (n=30, the tutorial default): digits match closed form exactly."""
    n = 30
    A = st.laplacian_1d(n)
    eps = st.EPS(A, problem_type="hep", which=Which.SMALLEST_REAL, nev=4,
                 ncv=20)
    eps.solve()
    exact = st.mat.generators.laplacian_1d_eigs(n, k=4)
    got = np.sort(eps.eigenvalues[:4].real)
    for g, e in zip(got, exact):
        assert f"{g:.7f}" == f"{e:.7f}"


def test_svd_grcar_reference_test1_digits():
    """src/svd/tests/test1.c: condition number of the n=30 Grcar matrix.
    Published expected output (src/svd/tests/output/test1_1.out):
    sigma_1=3.2215, sigma_n=0.9551, cond=3.3731 — matched to all 4
    printed decimals."""
    import scipy.sparse as sp

    from slepc_tpu.mat.linop import AIJOperator

    n = 30
    G = sp.diags([-np.ones(n - 1), np.ones(n), np.ones(n - 1),
                  np.ones(n - 2), np.ones(n - 3)], [-1, 0, 1, 2, 3],
                 format="csr")
    A = AIJOperator.from_scipy(G.astype(np.float64))
    s1 = st.SVD(A, nsv=1, which="largest")
    s1.solve()
    sn = st.SVD(A, nsv=1, which="smallest")
    sn.solve()
    assert s1.nconv >= 1 and sn.nconv >= 1
    sig1 = float(s1.sigma[0])
    sign = float(sn.sigma[0])
    assert f"{sig1:.4f}" == "3.2215"
    assert f"{sign:.4f}" == "0.9551"
    assert f"{sig1/sign:.4f}" == "3.3731"


def test_pep_reference_test1_digits():
    """src/pep/tests/test1.c (ex16-based QEP, 10x11 grid, N=110):
    published eigenvalues (src/pep/tests/output/test1_1.out):
    -1.16404+-1.65363i, -0.51784+-1.31039i — matched to all 5 printed
    decimals."""
    import scipy.sparse as sp

    from slepc_tpu.mat.linop import AIJOperator, DiagonalOperator

    n, m = 10, 11
    N = n * m
    K = sp.lil_matrix((N, N))
    C = sp.lil_matrix((N, N))
    for II in range(N):
        i, j = II // n, II % n
        if i > 0:
            K[II, II - n] = -1.0
        if i < m - 1:
            K[II, II + n] = -1.0
        if j > 0:
            K[II, II - 1] = -1.0
            C[II, II - 1] = -1.0
        if j < n - 1:
            K[II, II + 1] = -1.0
            C[II, II + 1] = -1.0
        K[II, II] = 4.0
        C[II, II] = 2.0
    M = DiagonalOperator(np.arange(1, N + 1).astype(np.float64))
    # solver="linear" honors which=LARGEST_MAGNITUDE on the linearized
    # pencil (our TOAR is target-driven: shift-invert at sigma, which
    # finds nearest-target — the 0.0494-magnitude pairs here)
    pep = st.PEP([AIJOperator.from_scipy(K.tocsr()),
                  AIJOperator.from_scipy(C.tocsr()), M],
                 nev=4, ncv=40, which=Which.LARGEST_MAGNITUDE, tol=1e-9,
                 solver="linear")
    pep.solve()
    assert pep.nconv >= 4
    got = pep.eigenvalues[:4]
    got = got[np.lexsort((np.sign(got.imag), np.round(-got.real, 6)))]
    want = [-1.16404 + 1.65363j, -1.16404 - 1.65363j,
            -0.51784 + 1.31039j, -0.51784 - 1.31039j]
    want = np.asarray(want)
    want = want[np.lexsort((np.sign(want.imag), np.round(-want.real, 6)))]
    for g, w in zip(got, want):
        assert f"{g.real:.5f}" == f"{w.real:.5f}", (g, w)
        assert f"{abs(g.imag):.5f}" == f"{abs(w.imag):.5f}", (g, w)


def test_nep_delay_reference_test10_digits():
    """src/nep/tests/test10.c (ex22-based 1-D delay problem, n=128,
    tau=0.001, a=20): published eigenvalue 0.80889
    (src/nep/tests/output/test10_1.out) — matched to all 5 printed
    decimals."""
    from slepc_tpu.mat.linop import DIAOperator

    n, tau, a = 128, 0.001, 20.0
    h = np.pi / (n + 1)
    main = np.full(n, -2.0 / (h * h) + a)
    up = np.zeros(n)
    up[: n - 1] = 1.0 / (h * h)
    lo = np.zeros(n)
    lo[1:] = 1.0 / (h * h)
    A = DIAOperator((-1, 0, 1), np.stack([lo, main, up]))
    Id = DIAOperator((0,), np.ones((1, n)))
    xi = (np.arange(n) + 1) * h
    b = -4.1 + xi * (1.0 - np.exp(xi - np.pi))
    B = DIAOperator((0,), b[None, :])
    f1 = st.FNRational([-1.0, 0.0])  # -lambda
    f2 = st.FNRational([1.0])
    f3 = st.FNExp()
    f3.set_scale(-tau, 1.0)
    nep = st.NEP(nev=1, solver="slp", target=0.55, tol=1e-9)
    nep.set_split_operators([Id, A, B], [f1, f2, f3])
    nep.solve()
    assert nep.nconv >= 1
    lam = nep.eigenvalues[0]
    assert f"{lam.real:.5f}" == "0.80889", lam
    assert abs(lam.imag) < 1e-6


def test_mfn_exp_reference_test2_digits():
    """src/mfn/tests/test2.c: y = exp(0.3*A)*ones on the 25x25 2-D
    Laplacian (N=625).  Published norm (src/mfn/tests/output/
    test2_1.out): 26.7835 — matched to all 4 printed decimals; the
    repeated half-step property ||exp(tA)v - exp(tA/2)exp(tA/2)v|| ~ 0
    the reference checks holds too."""
    nn = 25
    A = st.laplacian_2d(nn, nn, dtype=np.float64)
    f = st.FNExp()
    f.set_scale(0.3, 1.0)
    mfn = st.MFN(A, f, ncv=30, tol=1e-10)
    v = np.ones(nn * nn)
    y = np.asarray(mfn.solve(v))
    assert f"{np.linalg.norm(y):.4f}" == "26.7835"
    f2 = st.FNExp()
    f2.set_scale(0.15, 1.0)
    mfn2 = st.MFN(A, f2, ncv=30, tol=1e-10)
    y2 = np.asarray(mfn2.solve(np.asarray(mfn2.solve(v))))
    assert np.linalg.norm(y - y2) / np.linalg.norm(y) < 1e-8


def test_reference_datafile_loadable():
    """The reference ships PETSc binary matrices; our loader reads them
    (capability parity — the files themselves stay in the reference tree)."""
    import os

    path = "/root/reference/share/slepc/datafiles/matrices/rdb200.petsc"
    if not os.path.exists(path):
        pytest.skip("reference datafiles not present")
    from slepc_tpu.mat import petsc_io

    A = petsc_io.read_petsc_matrix(path)
    assert A.shape == (200, 200)
    op = petsc_io.load_operator(path)
    eps = st.EPS(op, problem_type="nhep", which=Which.LARGEST_REAL, nev=3,
                 ncv=40)
    eps.solve()
    assert eps.nconv >= 3
    w = np.linalg.eigvals(A.toarray())
    for lam in eps.eigenvalues[:3]:
        assert np.min(np.abs(w - lam)) < 1e-6


def test_reference_bfw62_gnhep():
    """bfw62a/b: the reference's generalized non-Hermitian test pair."""
    import os

    base = "/root/reference/share/slepc/datafiles/matrices"
    if not os.path.exists(f"{base}/bfw62a.petsc"):
        pytest.skip("reference datafiles not present")
    from slepc_tpu.mat import petsc_io

    A = petsc_io.read_petsc_matrix(f"{base}/bfw62a.petsc")
    B = petsc_io.read_petsc_matrix(f"{base}/bfw62b.petsc")
    import scipy.linalg as sla

    w = sla.eigvals(A.toarray(), B.toarray())
    opA = st.from_scipy(A)
    opB = st.from_scipy(B)
    eps = st.EPS(opA, opB, problem_type="gnhep", which=Which.LARGEST_REAL,
                 nev=4, ncv=30)
    eps.solve()
    assert eps.nconv >= 4
    for lam in eps.eigenvalues[:4]:
        assert np.min(np.abs(w - lam)) < 1e-5 * max(1, abs(lam))


def test_reference_speaker107_pep():
    """speaker107 K/C/M: the reference's quadratic eigenproblem datafiles
    (acoustic speaker model, (K + lam C + lam^2 M) x = 0)."""
    import os

    base = "/root/reference/share/slepc/datafiles/matrices"
    if not os.path.exists(f"{base}/speaker107k.petsc"):
        pytest.skip("reference datafiles not present")
    from slepc_tpu.mat import petsc_io

    K = st.from_scipy(petsc_io.read_petsc_matrix(f"{base}/speaker107k.petsc"))
    C = st.from_scipy(petsc_io.read_petsc_matrix(f"{base}/speaker107c.petsc"))
    M = st.from_scipy(petsc_io.read_petsc_matrix(f"{base}/speaker107m.petsc"))
    pep = st.PEP([K, C, M], nev=4, solver="toar", ncv=25)
    pep.set_target(-0.5)
    pep.solve()
    assert pep.nconv >= 4
    for i in range(4):
        assert pep.compute_error(i) < 1e-6


def test_ghiep_reference_test18_digits():
    """Reproduction of the reference's src/eps/tests/test18.c GHIEP:
    A = 5-point Laplacian (10x10 grid, N=100), B = anti-identity
    (B[i, N-1-i] = 1) — a symmetric-indefinite pencil solved with
    sinvert Krylov-Schur (reference args: -eps_nev 4 -eps_ncv 12).
    Published values (src/eps/tests/output/test18_1.out): 0.16203,
    -0.39851, -0.39851, 0.63499 — including BOTH copies of the double
    eigenvalue (ncv=20 here; recovering the second copy of a multiple
    eigenvalue at the reference's ncv=12 depends on restart noise)."""
    m = 10
    N = m * m
    A = st.laplacian_2d(m, m, scaled=False) if hasattr(
        st.mat.generators, "laplacian_2d_kw") else st.laplacian_2d(m, m)
    Ad = np.asarray(A.to_dense())
    # test18 builds the unscaled 5-point stencil (diag 4, offdiag -1)
    if not np.isclose(Ad[0, 0], 4.0):
        Ad = Ad * (4.0 / Ad[0, 0])
    Bd = np.fliplr(np.eye(N))
    eps = st.EPS(st.DenseOperator(Ad), st.DenseOperator(Bd),
                 problem_type="ghiep", nev=4, ncv=20)
    eps.set_target(0.0)
    eps.solve()
    assert eps.nconv >= 4
    got = np.sort(np.round(eps.eigenvalues[:4].real, 5))
    want = np.sort([0.16203, -0.39851, -0.39851, 0.63499])
    np.testing.assert_allclose(got, want, atol=1.1e-5)
