"""Native sparse LDL^T component tests (native/ldl.cpp via ctypes)."""

import numpy as np
import pytest
import scipy.sparse as sp

import slepc_tpu as st
from slepc_tpu.native import LDLFactorization, ldl_available

pytestmark = pytest.mark.skipif(not ldl_available(),
                                reason="native LDL toolchain unavailable")


def test_ldl_spd_solve_and_inertia():
    A = st.laplacian_2d(30, 28).to_scipy()
    n = A.shape[0]
    F = LDLFactorization(A)
    assert F.inertia() == (0, 0, n)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    x = F.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-12
    B = rng.standard_normal((n, 4))
    X = F.solve(B)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-12


def test_ldl_indefinite_inertia():
    """Shifted Laplacian: inertia counts eigenvalues below the shift —
    the spectrum-slicing primitive (reference EPSSliceGetInertia)."""
    A = st.laplacian_2d(25, 24).to_scipy()
    n = A.shape[0]
    exact = st.mat.generators.laplacian_2d_eigs(25, 24)
    for sigma in (0.5, 1.7, 4.03, 6.5):
        S = (A - sigma * sp.eye(n)).tocsr()
        F = LDLFactorization(S)
        neg, zero, pos = F.inertia()
        assert neg == int(np.sum(exact < sigma)), f"sigma={sigma}"
        rng = np.random.default_rng(1)
        b = rng.standard_normal(n)
        x = F.solve(b)
        assert np.linalg.norm(S @ x - b) / np.linalg.norm(b) < 1e-9


def test_ldl_random_symmetric():
    rng = np.random.default_rng(2)
    n = 300
    A = sp.random(n, n, density=0.02, random_state=rng)
    A = (A + A.T) * 0.5 + sp.diags(np.full(n, 0.5))
    A = sp.csr_matrix(A)
    Ad = A.toarray()
    w = np.linalg.eigvalsh(Ad)
    F = LDLFactorization(A)
    neg, zero, pos = F.inertia()
    assert neg == int(np.sum(w < 0))
    assert pos == int(np.sum(w > 0))
    b = rng.standard_normal(n)
    x = F.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-8


def test_slicing_uses_native_ldl():
    """Spectrum slicing on a 2-D (bandwidth > 64) problem — only reachable
    through the native LDL inertia."""
    A = st.laplacian_2d(12, 11)
    exact = st.mat.generators.laplacian_2d_eigs(12, 11)
    a, b = 0.4, 0.9
    inside = np.sort(exact[(exact > a) & (exact < b)])
    eps = st.EPS(A, problem_type="hep")
    eps.set_interval(a, b)
    eps.solve()
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside, rtol=1e-7)
