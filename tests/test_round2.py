"""Round-2 feature tests: hybrid ELL kernel, blocked KS, double-single
f64 kernel, real JD, slicing factor cache, true QArnoldi, PEP diagonal
scaling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

import slepc_tpu as st
from slepc_tpu.mat.generators import (laplacian_2d, laplacian_2d_eigs,
                                      laplacian_1d_eigs)


def test_hybrid_ell_kernel_matches_scipy():
    """Hybrid diagonal/gather ELL: dia slots + gather slots, exact SpMV,
    zero-copy chaining (reference MPIAIJ MatMult role, bvops.c:692)."""
    from slepc_tpu.ops.ell_pallas import GELLPaddedOperator

    rng = np.random.default_rng(0)
    side = 64
    n = side * side
    offs = [-side, -1, 0, 1, side]
    A = sp.diags([rng.standard_normal(n) for _ in offs], offs,
                 shape=(n, n), format="lil")
    for _ in range(200):  # irregular corrections within a narrow band
        i = rng.integers(0, n)
        j = np.clip(i + rng.integers(-300, 300), 0, n - 1)
        A[i, j] = rng.standard_normal()
    A = sp.csr_matrix(A)
    op = GELLPaddedOperator.from_scipy(A, block_rows=64)
    assert len(op.qr_slots) >= 5 and len(op.dslots) >= 1
    x = rng.standard_normal(n)
    y = np.asarray(op.unpad(op.mult2d(op.pad2d(jnp.asarray(x)))))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-12)
    y2 = np.asarray(op.unpad(op.mult2d(op.mult2d(op.pad2d(jnp.asarray(x))))))
    np.testing.assert_allclose(y2, A @ (A @ x), rtol=1e-11, atol=1e-11)


def test_aij_eps_routes_through_gell():
    """Square AIJ >= 4096 rows: the KS fast path packs and runs the
    hybrid ELL kernel; eigenvalues match the closed form."""
    L = laplacian_2d(70, 69, dtype=np.float64).to_scipy()
    A = st.from_scipy(L)
    eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=4,
                 ncv=32, tol=1e-9, max_it=200)
    eps.solve()
    assert A._gell is not None and A._gell is not False
    exact = laplacian_2d_eigs(70, 69, k=4)
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real), exact,
                               rtol=1e-8)


def test_blocked_ks_cycle():
    """Block Lanczos thick-restart (bandwidth-lean extension): correct
    eigenvalues, and resolves square-grid multiplicity-2 clusters that
    single-vector Krylov cannot split quickly."""
    A = st.laplacian_2d(40, 40, dtype=np.float64)  # double eigenvalues
    exact = laplacian_2d_eigs(40, 40, k=4)
    eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=4,
                 ncv=32, tol=1e-9, max_it=200)
    eps.block_size = 4
    eps.solve()
    assert eps.nconv >= 4
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real), exact,
                               rtol=1e-7)


def test_double_single_dia_kernel():
    """f64 via two-f32 compensated arithmetic: ~1e-14 relative SpMV error
    where plain f32 gives ~1e-7 (tolerance target slepcmath.h:25)."""
    from slepc_tpu.ops.dia_pallas import DIAPaddedOperatorDS

    A = st.laplacian_2d(90, 90, dtype=np.float64)
    As = A.to_scipy()
    op = DIAPaddedOperatorDS.from_dia(A)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    y = np.asarray(op.unpad(op.mult2d(op.pad2d(jnp.asarray(x)))))
    ref = As @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-13


def test_jd_inner_gmres_interior():
    """JD with the projected inner GMRES + fix rule converges to an
    interior target without a factorization (reference dvdimprovex.c)."""
    A = st.laplacian_1d(200)
    exact = laplacian_1d_eigs(200)
    tgt = 1.0
    eps = st.EPS(A, problem_type="hep", solver="jd", nev=2, ncv=24,
                 tol=1e-8, max_it=300)
    eps.set_target(tgt)
    eps.solve()
    assert eps.nconv >= 2
    want = np.sort(exact[np.argsort(np.abs(exact - tgt))[:2]])
    got = np.sort(eps.eigenvalues[:2].real)
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_gd_blocked_expansion():
    """GD with bs=2 block expansion still converges."""
    A = st.laplacian_2d(24, 23)
    exact = laplacian_2d_eigs(24, 23, k=3)
    eps = st.EPS(A, problem_type="hep", solver="gd",
                 which="smallest_real", nev=3, ncv=24, tol=1e-8, max_it=400)
    eps.davidson_bs = 2
    eps.solve()
    assert eps.nconv >= 3
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:3].real), exact,
                               rtol=1e-6)


def test_slicing_factorization_cache():
    """One factorization per distinct shift: a single-partition slice run
    uses O(#bisections) factorizations, not hundreds (ks-slice.c:227)."""
    A = st.laplacian_1d(300)
    exact = laplacian_1d_eigs(300)
    lo, hi = 0.5, 0.7
    inside = np.sort(exact[(exact > lo) & (exact < hi)])
    eps = st.EPS(A, problem_type="hep", tol=1e-9)
    eps.set_interval(lo, hi)
    eps.solve()
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside,
                               rtol=1e-8)
    assert eps.slice_factorizations <= 8


def test_qarnoldi_true_recurrence():
    """Q-Arnoldi (memory-saving two-level recurrence, qarnoldi.c) on a
    damped QEP matches the dense companion eigenvalues near the target."""
    import scipy.linalg as sla

    n = 150
    T = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1], format="csr")
    M = sp.eye(n, format="csr")
    C = sp.csr_matrix(0.1 * T + 0.3 * sp.eye(n))
    K = sp.csr_matrix(2.0 * T)
    A1 = np.block([[np.zeros((n, n)), np.eye(n)],
                   [-K.toarray(), -C.toarray()]])
    B1 = np.block([[np.eye(n), np.zeros((n, n))],
                   [np.zeros((n, n)), M.toarray()]])
    lam_all = sla.eig(A1, B1, right=False)
    target = -0.15 + 0j
    close = lam_all[np.argsort(np.abs(lam_all - target))][:4]
    pep = st.PEP([st.from_scipy(K), st.from_scipy(C), st.from_scipy(M)],
                 nev=4, solver="qarnoldi", tol=1e-9)
    pep.set_target(complex(target))
    pep.solve()
    assert pep.nconv >= 4
    for g in pep.eigenvalues[:4]:
        assert min(abs(g - c) for c in close) < 1e-8
    # residual on the original QEP
    x = pep._eigenvectors[:, 0]
    lam = pep.eigenvalues[0]
    r = K @ x + lam * (C @ x) + lam ** 2 * (M @ x)
    assert np.linalg.norm(r) < 1e-7


def test_pep_diagonal_scaling_backward_error():
    """PEP_SCALE_DIAGONAL balancing (pepimpl.h:17-19): on a badly row/
    column-scaled QEP the backward error improves by orders of magnitude."""
    rng = np.random.default_rng(0)
    n = 120
    T = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1], format="csr")
    D = sp.diags(10.0 ** rng.uniform(-4, 4, n))
    K = sp.csr_matrix(D @ (2.0 * T) @ D)
    C = sp.csr_matrix(D @ (0.1 * T + 0.3 * sp.eye(n)) @ D)
    M = sp.csr_matrix(D @ D)

    def backres(pep):
        out = []
        for i in range(min(pep.nconv, 3)):
            lam = pep.eigenvalues[i]
            x = pep._eigenvectors[:, i]
            r = K @ x + lam * (C @ x) + lam ** 2 * (M @ x)
            den = (abs(K).sum(1).max() + abs(lam) * abs(C).sum(1).max()
                   + abs(lam) ** 2 * abs(M).sum(1).max())
            out.append(np.linalg.norm(r) / den)
        return max(out)

    res = {}
    for scale in ("none", "diagonal"):
        pep = st.PEP([st.from_scipy(K), st.from_scipy(C), st.from_scipy(M)],
                     nev=4, solver="toar", tol=1e-9, scale=scale)
        pep.set_target(-0.15 + 0j)
        pep.solve()
        assert pep.nconv >= 3
        res[scale] = backres(pep)
    assert res["diagonal"] < 0.1 * res["none"]


def test_lme_sylvester_krylov_large():
    """Krylov-projected Sylvester (reference lmekrylov.c:48-199 pattern):
    exact factored-residual stopping; dense check at n=1000 (same code
    path, >600 gate) and matrix-free run at n=1e5."""
    from slepc_tpu.lme.lme import LME

    rng = np.random.default_rng(0)
    n, m = 1000, 800
    A = st.laplacian_1d(n) + 2.0 * st.IdentityOperator(n, np.float64)
    B = st.laplacian_1d(m) + 1.5 * st.IdentityOperator(m, np.float64)
    c1 = rng.standard_normal(n)
    c2 = rng.standard_normal(m)
    lme = LME(A, B=B, problem_type="sylvester", ncv=20, tol=1e-10)
    L, R = lme.solve(c1, c2)
    X = L @ R.conj().T
    Ad = np.asarray(A.to_dense())
    Bd = np.asarray(B.to_dense())
    res = np.linalg.norm(Ad @ X + X @ Bd + np.outer(c1, c2))
    assert res / (np.linalg.norm(c1) * np.linalg.norm(c2)) < 1e-9

    # matrix-free at n = 1e5: projected residual certified
    n2 = 100000
    A2 = st.laplacian_1d(n2) + 2.0 * st.IdentityOperator(n2, np.float64)
    B2 = st.laplacian_1d(n2) + 1.5 * st.IdentityOperator(n2, np.float64)
    lme2 = LME(A2, B=B2, problem_type="sylvester", ncv=30, tol=1e-9)
    L2, R2 = lme2.solve(rng.standard_normal(n2), rng.standard_normal(n2))
    assert lme2.errest < 1e-9
    assert L2.shape == (n2, 30) and R2.shape == (n2, 30)


def test_lme_stein_krylov():
    """Krylov-projected Stein equation A X A^H - X + c c^H = 0."""
    from slepc_tpu.lme.lme import LME

    rng = np.random.default_rng(1)
    n = 2000
    A = 0.2 * st.laplacian_1d(n)  # spectral radius < 1
    c = rng.standard_normal(n)
    lme = LME(A, problem_type="stein", ncv=24, tol=1e-10)
    Z = lme.solve(c)
    assert lme.errest < 1e-10
    AZ = np.asarray(A.mult(jnp.asarray(Z)))
    Rm = AZ @ AZ.T - Z @ Z.T + np.outer(c, c)
    assert np.linalg.norm(Rm) / np.linalg.norm(np.outer(c, c)) < 1e-9


def test_lanczos_light_reorth_modes():
    """Explicit Lanczos local/selective/periodic reorthogonalization
    (reference lanczos.c EPSLanczosReorthogType; selective =
    Parlett-Scott formed-Ritz-vector orthogonalization)."""
    A = st.laplacian_2d(32, 31, dtype=np.float64)
    exact_l = laplacian_2d_eigs(32, 31)[::-1][:3]
    for mode in ("local", "selective", "periodic"):
        eps = st.EPS(A, problem_type="hep", solver="lanczos",
                     which="largest_real", nev=3, ncv=22, tol=1e-9,
                     max_it=500)
        eps.set_reorthogonalization(mode)
        eps.solve()
        assert eps.nconv >= 3, mode
        got = np.sort(eps.eigenvalues[:3].real)[::-1]
        np.testing.assert_allclose(got, exact_l, rtol=1e-8,
                                   err_msg=mode)


def test_halo_block_mult_single_exchange():
    """HaloDIAOperator block mult ships ALL columns' boundary rows in one
    collective-permute pair (no per-column exchanges)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import functools

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from slepc_tpu.parallel import HaloDIAOperator
    from slepc_tpu.parallel.halo import dia_spmm_halo
    from slepc_tpu.sys import mesh as meshmod

    devs = np.asarray(jax.devices())
    m = Mesh(devs.reshape(-1), ("rows",))
    try:
        meshmod.set_mesh(m)
        A = st.laplacian_2d(40, 40)
        H = HaloDIAOperator.from_dia(A, m)
        rng = np.random.default_rng(0)
        X = rng.standard_normal((A.shape[0], 5))
        Xs = jax.device_put(jnp.asarray(X), NamedSharding(m, P("rows", None)))
        Y = np.asarray(H.mult(Xs))
        np.testing.assert_allclose(Y, A.to_scipy() @ X, atol=1e-12)
        hlo = jax.jit(functools.partial(
            dia_spmm_halo, offsets=A.offsets, mesh=m)).lower(
            H.diags, Xs).compile().as_text()
        assert hlo.count("collective-permute") == 2
        assert hlo.count("all-gather") == 0
    finally:
        meshmod.set_mesh(None)


def test_cli_driven_golden(capsys):
    """A solve driven entirely by a PETSc-style CLI string reproduces the
    golden output (reference tutorial-binary pattern, epsopts.c role)."""
    import sys as _sys

    _sys.path.insert(0, "examples")
    import ex_cli

    try:
        eps = ex_cli.main(["-n", "30", "-m", "29", "-eps_nev", "4",
                           "-eps_smallest_real", "-eps_tol", "1e-10",
                           "-eps_converged_reason", "-eps_error_relative"])
        out = capsys.readouterr().out
        assert eps.nconv >= 4
        # golden eigenvalues of the 30x29 Laplacian (closed form)
        for s in ("0.0212175", "0.0518963", "0.0539661", "0.0846449"):
            assert s in out, s
        assert "CONVERGED_TOL" in out
        # sinvert via -st_type
        eps2 = ex_cli.main(["-n", "24", "-m", "23", "-eps_nev", "3",
                            "-eps_target", "0.5", "-st_type", "sinvert"])
        assert eps2.nconv >= 3
    finally:
        import slepc_tpu as st

        st.set_global_options({})


def test_module_options_surface():
    """-svd_*/-pep_*/-mfn_* flags reach the module objects."""
    import slepc_tpu as st

    try:
        st.set_global_options(
            "-svd_nsv 3 -svd_type cross -pep_nev 5 -pep_type toar "
            "-mfn_ncv 17 -nep_nev 2")
        svd = st.SVD(st.laplacian_1d(32))
        assert svd.nsv == 3 and svd.solver == "cross"
        pep = st.PEP()
        assert pep.nev == 5 and pep.solver == "toar"
        mfn = st.MFN(st.laplacian_1d(32))
        assert mfn.ncv == 17
        nep = st.NEP()
        assert nep.nev == 2
    finally:
        st.set_global_options({})
