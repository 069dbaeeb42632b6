"""Unit tests for the L3 algebra classes: BV, DS, FN, RG, ST, KSP, Mat.

Mirrors the reference's per-class test programs
(src/sys/classes/{bv,ds,fn,rg,st}/tests/ — SURVEY §4).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import slepc_tpu as st
from slepc_tpu.bv import orthog
from slepc_tpu.ds.schur import schur, sort_schur, schur_eigvectors


# ---------------------------------------------------------------- Mat tier
def test_dia_spmv_vs_scipy():
    A = st.laplacian_2d(13, 11)
    As = A.to_scipy()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    np.testing.assert_allclose(np.asarray(A.mult(jnp.asarray(x))), As @ x, rtol=1e-12)
    X = rng.standard_normal((A.shape[0], 5))
    np.testing.assert_allclose(np.asarray(A.mult(jnp.asarray(X))), As @ X, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(A.mult_h(jnp.asarray(x))), As.T @ x, rtol=1e-12)


def test_aij_spmv_vs_scipy():
    A = st.mat.generators.random_sparse(200, 150, density=0.05, seed=1)
    As = A.to_scipy()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(150)
    np.testing.assert_allclose(np.asarray(A.mult(jnp.asarray(x))), As @ x, rtol=1e-12)
    y = rng.standard_normal(200)
    np.testing.assert_allclose(np.asarray(A.mult_h(jnp.asarray(y))), As.T @ y, rtol=1e-12)


def test_operator_algebra():
    rng = np.random.default_rng(2)
    Ad = rng.standard_normal((20, 20))
    Bd = rng.standard_normal((20, 20))
    A, B = st.DenseOperator(Ad), st.DenseOperator(Bd)
    x = rng.standard_normal(20)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray((A + B).mult(xj)), (Ad + Bd) @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray((2.5 * A).mult(xj)), 2.5 * Ad @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray((A @ B).mult(xj)), Ad @ (Bd @ x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(A.H.mult(xj)), Ad.T @ x, rtol=1e-12)
    S = A.shifted(0.7, B)
    np.testing.assert_allclose(np.asarray(S.mult(xj)), (Ad - 0.7 * Bd) @ x, rtol=1e-12)


def test_tile_and_bse():
    rng = np.random.default_rng(3)
    Ad = rng.standard_normal((8, 8))
    Bd = rng.standard_normal((8, 8))
    A, B = st.DenseOperator(Ad), st.DenseOperator(Bd)
    G = st.create_tile(1.0, A, 2.0, B, 0.5, B, -1.0, A)
    Gd = np.block([[Ad * 1.0, 2.0 * Bd], [0.5 * Bd, -1.0 * Ad]])
    x = rng.standard_normal(16)
    np.testing.assert_allclose(np.asarray(G.mult(jnp.asarray(x))), Gd @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(G.mult_h(jnp.asarray(x))), Gd.T @ x, rtol=1e-12)

    R = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    R = 0.5 * (R + R.conj().T)
    C = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    C = 0.5 * (C + C.T)  # complex symmetric
    H = st.create_bse(st.DenseOperator(R), st.DenseOperator(C))
    Hd = np.block([[R, C], [-C.conj().T, -R.T]])
    z = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    np.testing.assert_allclose(np.asarray(H.mult(jnp.asarray(z))), Hd @ z, rtol=1e-12)


# ---------------------------------------------------------------- BV tier
def test_bv_orthogonalize_column():
    rng = np.random.default_rng(4)
    bv = st.BV(50, 8)
    bv.set_random(seed=4)
    for j in range(8):
        bv.orthonormalize_column(j)
    V = bv.to_numpy()
    np.testing.assert_allclose(V.T @ V, np.eye(8), atol=1e-12)


def test_bv_block_orth_chol_svqb_tsqr():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((60, 6))
    for bt in (st.OrthogBlockType.CHOL, st.OrthogBlockType.SVQB,
               st.OrthogBlockType.TSQR, st.OrthogBlockType.GS):
        bv = st.BV(60, 6)
        bv.insert_vecs(0, jnp.asarray(X))
        R = bv.orthogonalize(bt)
        Q = bv.to_numpy()
        np.testing.assert_allclose(Q.T @ Q, np.eye(6), atol=1e-10)
        if bt != st.OrthogBlockType.SVQB:
            np.testing.assert_allclose(Q @ np.asarray(R), X, atol=1e-9)


def test_bv_b_inner_product():
    rng = np.random.default_rng(6)
    n = 40
    Bd = rng.standard_normal((n, n))
    Bd = Bd @ Bd.T + n * np.eye(n)
    B = st.DenseOperator(Bd)
    bv = st.BV(n, 5)
    bv.set_matrix(B)
    bv.set_random(seed=6)
    for j in range(5):
        bv.orthonormalize_column(j)
    V = bv.to_numpy()
    np.testing.assert_allclose(V.T @ Bd @ V, np.eye(5), atol=1e-10)


def test_bv_mult_ops():
    rng = np.random.default_rng(7)
    bv = st.BV(30, 6)
    X = rng.standard_normal((30, 6))
    bv.insert_vecs(0, jnp.asarray(X))
    q = rng.standard_normal(4)
    np.testing.assert_allclose(np.asarray(bv.mult_vec(q)), X[:, :4] @ q, rtol=1e-12)
    Q = rng.standard_normal((6, 6))
    bv2 = st.BV(30, 6)
    bv2.insert_vecs(0, jnp.asarray(X))
    bv2.mult_in_place(jnp.asarray(Q), 0, 6)
    np.testing.assert_allclose(bv2.to_numpy(), X @ Q, rtol=1e-10)
    # dot
    bv3 = st.BV(30, 6)
    bv3.insert_vecs(0, jnp.asarray(X))
    M = np.asarray(bv3.dot(bv3))
    np.testing.assert_allclose(M, X.T @ X, rtol=1e-12)


def test_bv_constraints():
    rng = np.random.default_rng(8)
    n = 40
    C = rng.standard_normal((n, 2))
    bv = st.BV(n, 4)
    bv.insert_constraints(jnp.asarray(C))
    bv.set_random(seed=8)
    for j in range(4):
        bv.orthonormalize_column(j)
    V = bv.to_numpy()
    np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-12)
    # orthogonal to the constraint space
    np.testing.assert_allclose(C.T @ V, np.zeros((2, 4)), atol=1e-10)


# ---------------------------------------------------------------- DS tier
def test_ds_hep_nhep():
    rng = np.random.default_rng(9)
    H = rng.standard_normal((12, 12))
    Hs = 0.5 * (H + H.T)
    w, Q = st.DSHEP().solve(Hs)
    np.testing.assert_allclose(Q @ np.diag(w) @ Q.T, Hs, atol=1e-12)

    T, Q2, eigs = st.DSNHEP().solve(H)
    np.testing.assert_allclose(Q2 @ T @ Q2.T, H, atol=1e-12)
    np.testing.assert_allclose(np.sort_complex(eigs), np.sort_complex(np.linalg.eigvals(H)),
                               atol=1e-10)


def test_ds_compact_arrow():
    """Compact arrow+tridiagonal DSHEP storage (reference DSArrowTridiag,
    dshep.c:221-261): plane-rotation reduction + steqr matches dense eigh
    and the structure detector round-trips thick-restart matrices."""
    from slepc_tpu.ds.compact import (arrow_expand, arrow_to_tridiag,
                                      extract_compact, solve_arrow_hep,
                                      solve_arrow_ghiep)

    rng = np.random.default_rng(3)
    for m, k in [(16, 7), (25, 12), (9, 0), (9, 1), (6, 5)]:
        d = rng.standard_normal(m)
        e = rng.standard_normal(m - 1)
        T = arrow_expand(d, e, k)
        a, b, Q0 = arrow_to_tridiag(d, e, k)
        Ttri = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        np.testing.assert_allclose(Q0.T @ T @ Q0, Ttri, atol=1e-12)
        w, Q = solve_arrow_hep(d, e, k)
        np.testing.assert_allclose(np.sort(w), np.linalg.eigvalsh(T),
                                   atol=1e-12)
        np.testing.assert_allclose(T @ Q, Q * w[None, :], atol=1e-11)
        # detector round-trip
        got = extract_compact(T)
        assert got is not None
        np.testing.assert_allclose(arrow_expand(*got), T, atol=1e-13)
    # detector rejects a dense matrix
    D = rng.standard_normal((8, 8))
    assert extract_compact(0.5 * (D + D.T)) is None
    # GHIEP compact form: residual check in the indefinite metric
    m, k = 12, 5
    d = rng.standard_normal(m)
    e = 0.1 * rng.standard_normal(m - 1)
    om = np.where(rng.standard_normal(m) > 0, 1.0, -1.0)
    T = arrow_expand(d, e, k)
    w, X = solve_arrow_ghiep(d, e, om, k)
    R = T @ X - (om[:, None] * X) * w[None, :]
    assert np.abs(R).max() < 1e-9


def test_ds_sort_schur_real_pairs():
    rng = np.random.default_rng(10)
    H = rng.standard_normal((10, 10))
    T, Q, eigs = schur(H)
    keys = -np.abs(eigs)
    from slepc_tpu.eps.krylovschur import _pair_keys

    keys = _pair_keys(T, keys)
    T2, Q2, eigs2 = sort_schur(T, Q, keys)
    np.testing.assert_allclose(Q2 @ T2 @ Q2.T, H, atol=1e-10)
    mags = np.abs(eigs2)
    assert np.all(np.diff(np.round(mags, 10)) <= 1e-9)  # descending |.|


def test_ds_gnhep():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((8, 8))
    B = rng.standard_normal((8, 8)) + 4 * np.eye(8)
    S, T, Q, Z, eigs = st.DSGNHEP().solve(A, B, lambda ev: -np.abs(ev))
    np.testing.assert_allclose(Q @ S @ Z.T, A, atol=1e-10)
    np.testing.assert_allclose(Q @ T @ Z.T, B, atol=1e-10)
    import scipy.linalg as sla

    w = sla.eigvals(A, B)
    np.testing.assert_allclose(np.sort_complex(np.round(eigs, 8)),
                               np.sort_complex(np.round(w, 8)), atol=1e-6)


def test_ds_svd_pep_ghiep():
    rng = np.random.default_rng(12)
    Bm = rng.standard_normal((9, 6))
    U, s, Vh = st.DSSVD().solve(Bm)
    np.testing.assert_allclose(U @ np.diag(s) @ Vh, Bm, atol=1e-12)

    K = rng.standard_normal((6, 6))
    C = rng.standard_normal((6, 6))
    M = rng.standard_normal((6, 6)) + 6 * np.eye(6)
    lam, X = st.DSPEP().solve([K, C, M])
    # residual check on a few finite eigenvalues
    fin = np.isfinite(lam)
    for j in np.where(fin)[0][:5]:
        r = (K + lam[j] * C + lam[j] ** 2 * M) @ X[:, j]
        assert np.linalg.norm(r) < 1e-8 * (1 + abs(lam[j]) ** 2)

    T = rng.standard_normal((6, 6))
    T = 0.5 * (T + T.T)
    om = np.array([1, 1, -1, 1, -1, 1.0])
    lam2, X2 = st.DSGHIEP().solve(T, om)
    for j in range(6):
        r = T @ X2[:, j] - lam2[j] * (om * X2[:, j])
        assert np.linalg.norm(r) < 1e-6


# ---------------------------------------------------------------- FN tier
def test_fn_scalar_and_matrix():
    import scipy.linalg as sla

    rng = np.random.default_rng(13)
    A = rng.standard_normal((8, 8)) / 3

    f = st.FNExp()
    assert abs(f.eval(0.3) - np.exp(0.3)) < 1e-14
    np.testing.assert_allclose(f.eval_mat(A), sla.expm(A), atol=1e-12)
    f.set_method(1)  # own Padé
    np.testing.assert_allclose(f.eval_mat(A), sla.expm(A), atol=1e-10)
    f.set_scale(0.5, 2.0)  # beta*f(alpha*x): 2*exp(0.5x)
    np.testing.assert_allclose(f.eval_mat(A), 2 * sla.expm(0.5 * A), atol=1e-10)

    Aspd = A @ A.T + 2 * np.eye(8)
    np.testing.assert_allclose(st.FNSqrt().eval_mat(Aspd) @ st.FNSqrt().eval_mat(Aspd),
                               Aspd, atol=1e-9)
    g = st.FNSqrt()
    g.set_method(1)  # Denman-Beavers
    np.testing.assert_allclose(g.eval_mat(Aspd) @ g.eval_mat(Aspd), Aspd, atol=1e-9)
    np.testing.assert_allclose(st.FNLog().eval_mat(Aspd), sla.logm(Aspd), atol=1e-9)
    Fi = st.FNInvSqrt().eval_mat(Aspd)
    np.testing.assert_allclose(Fi @ Aspd @ Fi, np.eye(8), atol=1e-9)

    # phi functions: phi_1(x) = (e^x - 1)/x
    p1 = st.FNPhi(1)
    x = 0.7
    assert abs(p1.eval(x) - (np.exp(x) - 1) / x) < 1e-12
    F1 = p1.eval_mat(A)
    np.testing.assert_allclose(F1, np.linalg.solve(A, sla.expm(A) - np.eye(8)), atol=1e-9)

    r = st.FNRational([1.0, 2.0, 3.0], [1.0, 0.5])  # (x^2+2x+3)/(x+0.5)
    assert abs(r.eval(2.0) - (4 + 4 + 3) / 2.5) < 1e-12
    c = st.FNCombine("multiply", st.FNExp(), st.FNExp())
    assert abs(c.eval(0.4) - np.exp(0.8)) < 1e-12


# ---------------------------------------------------------------- RG tier
def test_rg_regions():
    e = st.RGEllipse(center=1 + 0j, radius=2.0, vscale=0.5)
    assert e.check_inside(1.0) > 0
    assert e.check_inside(1 + 0.9j) > 0
    assert e.check_inside(4.0) < 0
    z, w = e.contour(64)
    # contour integral of 1/(z - a) over the ellipse = 1 for a inside
    val = np.sum(w / (z - 1.2))
    assert abs(val - 1.0) < 1e-6

    i = st.RGInterval(-1, 1, -0.5, 0.5)
    assert i.check_inside(0) > 0
    assert i.check_inside(2) < 0
    assert i.check_inside(0.5 + 0.6j) < 0

    p = st.RGPolygon([0, 2, 2 + 2j, 2j])
    assert p.check_inside(1 + 1j) > 0
    assert p.check_inside(-1) < 0
    z, w = p.contour(200)
    val = np.sum(w / (z - (1 + 1j)))
    assert abs(val - 1.0) < 1e-2

    r = st.RGRing(center=0, radius=2.0, width=0.5)
    assert r.check_inside(2.0) > 0
    assert r.check_inside(0.0) < 0
    assert r.check_inside(2.4) < 0


# ---------------------------------------------------------------- KSP tier
def test_ksp_methods():
    A = st.laplacian_1d(100)
    rng = np.random.default_rng(14)
    b = rng.standard_normal(100)
    xs = A.to_scipy()
    import scipy.sparse.linalg as spla

    x_ref = spla.spsolve(xs.tocsc(), b)
    for method in ("cg", "bicgstab", "gmres", "direct"):
        x = np.asarray(st.solve_linear(A, jnp.asarray(b), method=method,
                                       rtol=1e-12, hermitian=True))
        np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)


def test_direct_inertia():
    # tridiagonal inertia by Sturm counts vs dense eigvals
    n = 50
    A = st.laplacian_1d(n)
    sigma = 1.03
    from slepc_tpu.ksp.direct import DirectSolver
    from slepc_tpu.mat.linop import SumOperator, IdentityOperator

    S = SumOperator((A, IdentityOperator(n)), (1.0, -sigma))
    exact = st.mat.generators.laplacian_1d_eigs(n)
    n_below = int(np.sum(exact < sigma))
    import scipy.sparse as sp

    shifted = A.to_scipy() - sigma * sp.eye(n)
    ds = DirectSolver(st.from_scipy(sp.csr_matrix(shifted)))
    neg, zero, pos = ds.inertia()
    assert neg == n_below


def test_st_transforms():
    rng = np.random.default_rng(15)
    n = 30
    Ad = rng.standard_normal((n, n))
    Ad = 0.5 * (Ad + Ad.T)
    A = st.DenseOperator(Ad)
    x = rng.standard_normal(n)
    xj = jnp.asarray(x)

    s = st.STShift([A], sigma=0.4)
    np.testing.assert_allclose(np.asarray(s.apply(xj)), (Ad - 0.4 * np.eye(n)) @ x,
                               rtol=1e-12)
    np.testing.assert_allclose(s.back_transform(np.array([1.0])), [1.4])

    si = st.STSinvert([A], sigma=0.3, hermitian=True)
    y = np.asarray(si.apply(xj))
    np.testing.assert_allclose((Ad - 0.3 * np.eye(n)) @ y, x, atol=1e-8)

    c = st.STCayley([A], sigma=0.3, nu=0.2)
    y = np.asarray(c.apply(xj))
    np.testing.assert_allclose((Ad - 0.3 * np.eye(n)) @ y, (Ad + 0.2 * np.eye(n)) @ x,
                               atol=1e-8)


def test_st_filter():
    """Chebyshev filter amplifies the target interval."""
    A = st.laplacian_1d(80)
    f = st.STFilter([A], interval=(1.0, 1.5), degree=60,
                    spectral_range=(0.0, 4.0))
    vals = f.filter_value(np.array([0.2, 1.25, 3.0]))
    assert vals[1] > 5 * max(vals[0], vals[2])


def test_petsc_binary_io(tmp_path):
    """PETSc binary Mat/Vec round trip (reference datafile format)."""
    import scipy.sparse as sp
    from slepc_tpu.mat import petsc_io

    rng = np.random.default_rng(0)
    A = sp.random(40, 30, density=0.1, random_state=rng, format="csr")
    p = str(tmp_path / "m.petsc")
    petsc_io.write_petsc_matrix(p, A)
    B = petsc_io.read_petsc_matrix(p)
    assert (A != B).nnz == 0
    op = petsc_io.load_operator(p)
    x = rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(op.mult(jnp.asarray(x))), A @ x,
                               rtol=1e-12)
    v = rng.standard_normal(40)
    pv = str(tmp_path / "v.petsc")
    petsc_io.write_petsc_vector(pv, v)
    np.testing.assert_allclose(petsc_io.read_petsc_vector(pv), v)


def test_bv_biorthogonalize():
    from slepc_tpu.bv.bv import biorthogonalize_column

    rng = np.random.default_rng(1)
    n, m = 40, 5
    V = st.BV(n, m)
    W = st.BV(n, m)
    V.insert_vecs(0, jnp.asarray(rng.standard_normal((n, m))))
    W.insert_vecs(0, jnp.asarray(rng.standard_normal((n, m))))
    for j in range(m):
        delta = biorthogonalize_column(V, W, j)
        # normalize to (w_j, v_j) = 1
        V.scale_column(j, 1.0 / np.sqrt(np.abs(complex(delta))))
        W.scale_column(j, np.sign(complex(delta).real) / np.sqrt(np.abs(complex(delta))))
    G = W.to_numpy().T @ V.to_numpy()
    np.testing.assert_allclose(G, np.eye(m), atol=1e-8)


def test_norm_estimate_randomized():
    """Randomized norm estimate (reference: MatNormEstimate,
    matutil.c:391) overestimates ||A||_2 w.h.p. and stays within sqrt(n)."""
    rng = np.random.default_rng(0)
    A = rng.standard_normal((200, 200))
    op = st.DenseOperator(A)
    est = st.norm_estimate_randomized(op)
    n2 = np.linalg.norm(A, 2)
    assert est > 0.3 * n2
    assert est < np.sqrt(200) * n2 * 1.01


def test_st_check_null_space():
    """Deflation vectors in the nullspace of A - sigma*B attach to the
    KSP (reference: STCheckNullSpace, stsles.c:413)."""
    n = 50
    # A singular: constant vector in nullspace (Neumann-like Laplacian)
    A = (np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1)
         + np.diag(np.full(n - 1, -1.0), -1))
    A[0, 0] = A[-1, -1] = 1.0
    ones = np.ones(n) / np.sqrt(n)
    op = st.DenseOperator(A)
    stx = st.STSinvert([op], sigma=0.0)
    nc = stx.check_null_space(ones)
    assert nc == 1
    assert stx.nullspace is not None
    # solving with the singular matrix now projects out the nullspace
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    b -= ones * (ones @ b)
    x = np.asarray(stx.ksp.solve(jnp.asarray(b)))
    assert abs(ones @ x) < 1e-8
    r = A @ x - b
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(b)


def test_event_logging():
    """Named-event registry (reference: PetscLog events / -log_view)."""
    st.log_begin()
    A = st.laplacian_1d(200)
    eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=3)
    eps.solve()
    table = st.log_view()
    assert ("BV_MatArnoldi" in table) or ("EPS_KSCycle_jit" in table)
    # a non-fast-path run records the host DS tier too
    st.log_reset()
    st.log_begin()
    eps2 = st.EPS(A, problem_type="nhep", which="largest_magnitude", nev=3)
    eps2.solve()
    table2 = st.log_view()
    assert "BV_MatArnoldi" in table2
    assert "DS_Solve" in table2
    st.log_reset()


def test_eps_checkpoint_resume(tmp_path):
    """save_state/load_state: a resumed run re-converges immediately."""
    A = st.laplacian_1d(400)
    eps = st.EPS(A, problem_type="hep", which="largest_real", nev=4, ncv=24)
    eps.solve()
    assert eps.nconv >= 4
    its_cold = eps.its
    f = str(tmp_path / "state.npz")
    eps.save_state(f)
    eps2 = st.EPS(A, problem_type="hep", which="largest_real", nev=4, ncv=24)
    eps2.load_state(f)
    eps2.solve()
    assert eps2.nconv >= 4
    np.testing.assert_allclose(np.sort(eps2.eigenvalues[:4].real),
                               np.sort(eps.eigenvalues[:4].real), rtol=1e-8)
    assert eps2.its <= max(2, its_cold // 2)


def test_st_filter_filtlan_base():
    """Smooth (FILTLAN-style) base filter: exactly-flat plateau, 0.5 at
    the endpoints, no ringing."""
    A = st.laplacian_1d(80)
    f = st.STFilter([A], interval=(1.0, 1.5), degree=300,
                    spectral_range=(0.0, 4.0), damping="filtlan")
    vals = f.filter_value(np.array([0.2, 1.0, 1.25, 1.5, 3.0]))
    assert abs(vals[1] - 0.5) < 1e-3 and abs(vals[3] - 0.5) < 1e-3
    assert abs(vals[2] - 1.0) < 1e-3
    assert abs(vals[0]) < 1e-3 and abs(vals[4]) < 1e-3


# ------------------------------------------------------------- FN methods
def test_fn_exp_method_parity():
    """All FNExp methods agree with scipy expm at f64 on non-normal A
    (reference method table fnexp.c:1656-1664; subdiagonal Padé =
    Güttel-Nakatsukasa role)."""
    import scipy.linalg as sla

    rng = np.random.default_rng(0)
    n = 24
    A = np.diag(-np.linspace(0, 3, n)) \
        + np.triu(rng.standard_normal((n, n)), 1) * 4
    ref = sla.expm(A)
    for meth, tol in ((0, 1e-13), (1, 1e-13), (3, 1e-10), (4, 1e-12)):
        f = st.FNExp()
        f.set_method(meth)
        err = np.linalg.norm(f.eval_mat(A) - ref, "fro") \
            / np.linalg.norm(ref, "fro")
        assert err < tol, (meth, err)
    # hermitian fast path
    Ah = A + A.T
    f = st.FNExp()
    f.set_method(2)
    err = np.linalg.norm(f.eval_mat(Ah) - sla.expm(Ah), "fro") \
        / np.linalg.norm(sla.expm(Ah), "fro")
    assert err < 1e-12


def test_fn_sqrt_method_parity():
    """All FNSqrt iteration variants produce F with F^2 = A
    (reference method table fnsqrt.c:369-374)."""
    rng = np.random.default_rng(1)
    M = rng.standard_normal((20, 20))
    A = M @ M.T + 20 * np.eye(20)
    for meth in (0, 1, 2, 3, 4):
        f = st.FNSqrt()
        f.set_method(meth)
        F = f.eval_mat(A)
        err = np.linalg.norm(F @ F - A, "fro") / np.linalg.norm(A, "fro")
        assert err < 1e-11, (meth, err)


def test_fn_string_dispatch():
    """FN('exp') constructs the registered subclass (slepc4py FNSetType
    role)."""
    assert isinstance(st.FN("exp"), st.FNExp)
    assert st.FN("phi", k=2).k == 2
    assert isinstance(st.FNExp(), st.FNExp)


def test_dsghiep_hz_structure_preserving():
    """Definite-type (T, Omega) pencils solve via the hyperbolic-Jacobi
    HZ role (reference impls/ghiep/hz.c): exact signature preservation
    and Omega-orthonormal eigenvectors."""
    from slepc_tpu.ds.types import DSGHIEP, _hz_hyperbolic_jacobi

    rng = np.random.default_rng(0)
    n = 12
    om = np.array([1.0] * 7 + [-1.0] * 5)
    rng.shuffle(om)
    G0 = np.eye(n)
    for _ in range(80):
        i, j = sorted(rng.choice(n, 2, replace=False))
        if om[i] == om[j]:
            th = rng.uniform(-1, 1)
            R = np.array([[np.cos(th), np.sin(th)],
                          [-np.sin(th), np.cos(th)]])
        else:
            y = rng.uniform(-0.4, 0.4)
            R = np.array([[np.cosh(y), np.sinh(y)],
                          [np.sinh(y), np.cosh(y)]])
        G0[:, [i, j]] = G0[:, [i, j]] @ R
    d = rng.uniform(0.5, 3.0, n)  # positive -> T SPD (definite type)
    Gi = np.linalg.inv(G0)
    T = Gi.T @ np.diag(d) @ Gi
    lam_true = np.sort(d * om)
    w, G, ok = _hz_hyperbolic_jacobi(T, om)
    assert ok
    assert np.abs(np.sort(w) - lam_true).max() < 1e-12
    # Omega-orthogonality of the eigenvector basis (exact structure)
    assert np.abs(G.T @ np.diag(om) @ G - np.diag(om)).max() < 1e-12
    # the DS route picks HZ for definite T and returns real output
    w2, X2 = DSGHIEP().solve(T, om)
    assert not np.iscomplexobj(w2)
    R2 = T @ X2 - (om[:, None] * X2) * w2[None, :]
    assert np.abs(R2).max() < 1e-7 * np.linalg.norm(T)
    # indefinite T (complex pairs possible) falls back without error
    Tind = T.copy()
    Tind[0, 0] = -Tind[0, 0]
    DSGHIEP().solve(Tind, om)
