"""Round-5 additions: blocked/partial filtered cycles, robustness seed
sweep, and the bench-resilience counters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slepc_tpu.eps.cheb_accel import ks_cheb_smallest
from slepc_tpu.mat.generators import (laplacian_2d, laplacian_2d_eigs)


class TestChebBlocked:
    """Blocked filtered cycle (BCGS2 + SVQB^2 under ChebAmplifyOperator).

    Reference role: block orthogonalization bvorthog.c:492-726 composed
    with the STFILTER polynomial seat (filter.c:18-40)."""

    def test_blocked_converges_matches_exact(self):
        side = 60
        A = laplacian_2d(side, side, dtype=np.float64)
        exact = laplacian_2d_eigs(side, side, k=8)
        res = ks_cheb_smallest(A, nev=8, tol=1e-8, ncv=24, degree=60,
                               block=4, key=jax.random.PRNGKey(3))
        assert res["nconv"] >= 8
        got = np.sort(res["lam"][:8])
        assert np.abs(got - exact).max() < 1e-10
        assert np.max(res["resid"][:8]) < 1e-8

    def test_blocked_ncv_must_divide(self):
        A = laplacian_2d(20, 20, dtype=np.float64)
        with pytest.raises(ValueError):
            ks_cheb_smallest(A, nev=4, tol=1e-8, ncv=22, degree=20,
                             block=4)

    def test_blocked_window_adaptation(self):
        # tight ncv forces window adaptations through the blocked path
        side = 60
        A = laplacian_2d(side, side, dtype=np.float64)
        exact = laplacian_2d_eigs(side, side, k=6)
        res = ks_cheb_smallest(A, nev=6, tol=1e-8, ncv=16, degree=40,
                               block=4, key=jax.random.PRNGKey(5),
                               max_cycles=200)
        assert res["nconv"] >= 6
        got = np.sort(res["lam"][:6])
        assert np.abs(got - exact).max() < 1e-9


class TestChebPartial:
    """Omega-monitored semi-orthogonal extension under the filter: same
    Krylov depth as full CGS2 at ~1/4 of the basis traffic; the
    certification CholQR2-orthonormalizes before Rayleigh-Ritz."""

    def test_partial_converges_matches_exact(self):
        side = 80
        A = laplacian_2d(side, side, dtype=np.float64)
        exact = laplacian_2d_eigs(side, side, k=10)
        res = ks_cheb_smallest(A, nev=10, tol=1e-8, ncv=32, degree=80,
                               reorth="partial", key=jax.random.PRNGKey(7))
        assert res["nconv"] >= 10
        got = np.sort(res["lam"][:10])
        assert np.abs(got - exact).max() < 1e-10
        assert np.max(res["resid"][:10]) < 1e-8

    def test_partial_column_count_comparable_to_full(self):
        # the whole point: partial must not pay extra columns
        side = 80
        A = laplacian_2d(side, side, dtype=np.float64)
        cols = {}
        for reo in ("full", "partial"):
            res = ks_cheb_smallest(A, nev=10, tol=1e-8, ncv=32, degree=80,
                                   reorth=reo, key=jax.random.PRNGKey(7))
            assert res["nconv"] >= 10
            cols[reo] = res["stats"]["cols"]
        assert cols["partial"] <= 1.5 * cols["full"]


@pytest.mark.slow
class TestChebSeedSweep:
    """Flagship robustness evidence (VERDICT r4 item 7): the driver must
    converge across seeds at mid-scale, not rely on one lucky window."""

    def test_three_seeds_converge(self):
        side = 150
        A = laplacian_2d(side, side, dtype=np.float64)
        exact = laplacian_2d_eigs(side, side, k=12)
        for seed in (0, 11, 202):
            res = ks_cheb_smallest(A, nev=12, tol=1e-8, ncv=32,
                                   degree=100, reorth="partial",
                                   key=jax.random.PRNGKey(seed),
                                   max_cycles=300)
            assert res["nconv"] >= 12, f"seed {seed}: {res['nconv']}"
            got = np.sort(res["lam"][:12])
            assert np.abs(got - exact).max() < 1e-9, f"seed {seed}"


class TestSplitComplexNHEP:
    """Split-complex (two-real-planes) tier: complex DIA SpMV + the
    Arnoldi/Krylov-Schur NHEP path in real arithmetic (VERDICT r4 item 3;
    reference complex-scalar surface, include/slepcmath.h)."""

    def _spiral_tridiag(self, n, dtype=np.complex128, seed=0):
        rng = np.random.default_rng(seed)
        th = np.linspace(0, 4 * np.pi, n)
        r = np.linspace(0.5, 3.0, n)
        d = (r * np.exp(1j * th)).astype(dtype)
        off = 0.05 * (rng.standard_normal(n)
                      + 1j * rng.standard_normal(n)).astype(dtype)
        lo = np.zeros(n, dtype)
        hi = np.zeros(n, dtype)
        hi[: n - 1] = off[: n - 1]
        lo[1:] = off[: n - 1] * 0.3
        return lo, d, hi

    def test_mult_split_matches_scipy(self):
        import scipy.sparse as sp

        from slepc_tpu.ops.complex_split import SplitComplexDIAOperator

        n = 4000
        lo, d, hi = self._spiral_tridiag(n)
        op = SplitComplexDIAOperator.from_complex_dia(
            (-1, 0, 1), np.stack([lo, d, hi]))
        rng = np.random.default_rng(1)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        y = op.unpad_split(op.mult_split(op.pad_split(x)))
        A = sp.diags([lo[1:], d, hi[: n - 1]], [-1, 0, 1]).tocsr()
        ref = A @ x
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12

    def test_nhep_split_solve_vs_scipy(self):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        import jax

        from slepc_tpu.eps.nhep_split import nhep_split_solve
        from slepc_tpu.ops.complex_split import SplitComplexDIAOperator

        n = 3000
        lo, d, hi = self._spiral_tridiag(n)
        op = SplitComplexDIAOperator.from_complex_dia(
            (-1, 0, 1), np.stack([lo, d, hi]))
        res = nhep_split_solve(op, nev=6, ncv=32, tol=1e-10,
                               key=jax.random.PRNGKey(1))
        assert res["nconv"] >= 6
        assert res["resid"][:6].max() < 1e-8
        # host certification: each pair is a true eigenpair of the
        # scipy-assembled matrix (the top-|lambda| set itself is nearly
        # degenerate at the spiral's outer end, so set-matching against
        # ARPACK is ill-posed — residuals are the deterministic check)
        A = sp.diags([lo[1:], d, hi[: n - 1]], [-1, 0, 1],
                     format="csr").astype(complex)
        for i in range(6):
            lam = res["lam"][i]
            x = op.unpad_split(np.asarray(res["V"][i]))
            r = np.linalg.norm(A @ x - lam * x) / (
                abs(lam) * np.linalg.norm(x))
            assert r < 1e-8, (i, lam, r)
            # and it sits in the top-magnitude band of the spectrum
            assert abs(lam) > 0.95 * np.abs(d).max()


class TestTridiagDevice:
    """Device-side tridiagonal LDL^T (associative-scan Moebius/affine
    recurrences): factor, solve, inertia — the slicing certificate tier
    (VERDICT r4 item 4; reference ks-slice.c:227-258, stsles.c:35-59)."""

    def _rand_tridiag(self, n, seed=0):
        rng = np.random.default_rng(seed)
        a = 2.0 + 0.1 * rng.standard_normal(n)
        b = -1.0 + 0.05 * rng.standard_normal(n - 1)
        return a, b

    def test_inertia_matches_eigvals(self):
        import scipy.linalg as sla

        from slepc_tpu.ksp.tridiag_device import tridiag_inertia

        a, b = self._rand_tridiag(3000)
        w = sla.eigh_tridiagonal(a, b, eigvals_only=True)
        for sigma in (0.1, 1.0, 2.0, 3.5):
            assert int(tridiag_inertia(a, b, sigma)) == int(
                np.sum(w < sigma))

    def test_solve_with_refinement(self):
        from slepc_tpu.ksp.tridiag_device import tridiag_solve

        n = 4000
        a, b = self._rand_tridiag(n, seed=1)
        rng = np.random.default_rng(2)
        rhs = rng.standard_normal(n)
        for sigma in (0.37, 1.9, 3.2):
            x = np.asarray(tridiag_solve(a, b, sigma, rhs))
            T = np.diag(a - sigma) + np.diag(b, 1) + np.diag(b, -1)
            assert (np.linalg.norm(T @ x - rhs)
                    / np.linalg.norm(rhs)) < 5e-13

    def test_directsolver_routes_tridiag_device(self):
        from slepc_tpu.ksp.direct import DirectSolver
        from slepc_tpu.mat.linop import DIAOperator

        n = 2000
        a, b = self._rand_tridiag(n, seed=3)
        lo = np.zeros(n)
        hi = np.zeros(n)
        hi[: n - 1] = b
        lo[1:] = b
        A = DIAOperator((-1, 0, 1), np.stack([lo, a, hi]))
        ds = DirectSolver(A)
        assert ds.backend == "tridiag_device"
        neg, zero, pos = ds.inertia()
        import scipy.linalg as sla

        w = sla.eigh_tridiagonal(a, b, eigvals_only=True)
        assert neg == int(np.sum(w < 0))
        rhs = np.random.default_rng(4).standard_normal(n)
        x = np.asarray(ds.solve(jnp.asarray(rhs)))
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        assert np.linalg.norm(T @ x - rhs) / np.linalg.norm(rhs) < 1e-12

    def test_slicing_through_device_backend(self):
        import slepc_tpu as stt
        from slepc_tpu.mat.linop import DIAOperator

        n = 4000
        a = np.full(n, 2.0)
        b = np.full(n - 1, -1.0)
        lo = np.zeros(n)
        hi = np.zeros(n)
        hi[: n - 1] = b
        lo[1:] = b
        A = DIAOperator((-1, 0, 1), np.stack([lo, a, hi]))
        ks = np.arange(1, n + 1)
        exact = 2 - 2 * np.cos(ks * np.pi / (n + 1))
        intl = (0.002, 0.01)
        expect = np.sort(exact[(exact > intl[0]) & (exact < intl[1])])
        eps = stt.EPS(A, problem_type="hep", nev=len(expect), tol=1e-9)
        eps.set_interval(*intl)
        eps.solve()
        assert eps.nconv == len(expect)
        got = np.sort(eps.eigenvalues[: eps.nconv].real)
        assert np.abs(got - expect).max() < 1e-8


class TestBlockTridiagDevice:
    """Device block-tridiagonal LDL^T (banded/2-D-Laplacian class):
    scan-based block pivots, per-block Sturm inertia, block
    substitution solves — extends the device direct tier beyond
    tridiagonal (reference MUMPS seat, stsles.c:35-59)."""

    def test_inertia_and_solve_vs_dense(self):
        from slepc_tpu.ksp.tridiag_device import (btridiag_inertia,
                                                  btridiag_of_operator,
                                                  btridiag_solve)
        from slepc_tpu.mat.generators import laplacian_2d

        side = 30
        A = laplacian_2d(side, side, dtype=np.float64)
        btd = btridiag_of_operator(A)
        assert btd is not None
        Ab, Bb = btd
        As = A.to_scipy().toarray()
        w = np.linalg.eigvalsh(As)
        for sigma in (0.05, 2.0, 7.0):
            assert int(btridiag_inertia(Ab, Bb, sigma)) == int(
                np.sum(w < sigma))
        rng = np.random.default_rng(0)
        rhs = rng.standard_normal(side * side)
        x = np.asarray(btridiag_solve(Ab, Bb, 0.013, rhs))
        r = np.linalg.norm((As - 0.013 * np.eye(side * side)) @ x - rhs)
        assert r / np.linalg.norm(rhs) < 1e-11

    def test_2d_slicing_via_device_backend(self):
        import slepc_tpu as stt
        from slepc_tpu.ksp.direct import DirectSolver
        from slepc_tpu.mat.generators import laplacian_2d

        nx, ny = 40, 41  # anisotropic: generically simple spectrum
        A = laplacian_2d(nx, ny, dtype=np.float64)
        assert DirectSolver(A).backend == "btridiag_device"
        lx = 2 - 2 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
        ly = 2 - 2 * np.cos(np.arange(1, ny + 1) * np.pi / (ny + 1))
        exact = np.sort((lx[:, None] + ly[None, :]).ravel())
        intl = (0.04, 0.12)
        expect = np.sort(exact[(exact > intl[0]) & (exact < intl[1])])
        eps = stt.EPS(A, problem_type="hep", nev=len(expect), tol=1e-9)
        eps.set_interval(*intl)
        eps.solve()
        assert eps.nconv == len(expect)
        got = np.sort(eps.eigenvalues[: eps.nconv].real)
        assert np.abs(got - expect).max() < 1e-8


class TestBDCDeflationScaling:
    """r4 advisor: pass-1 deflation must use the LAED2-style rho*|z_k|
    criterion so deflation error stays O(tol) uniformly in rho."""

    def test_large_rho_under_threshold(self):
        from slepc_tpu.ds.bdc import dpr1_eig

        rng = np.random.default_rng(0)
        n = 40
        eps = np.finfo(float).eps
        for rho in (1.0, 1e6, 1e12):
            d = np.sort(rng.standard_normal(n))
            z = rng.standard_normal(n)
            z /= np.linalg.norm(z)
            dspread = max(d[-1] - d[0], abs(d[-1]), abs(d[0]), 1.0)
            tol = 8 * eps * max(dspread, rho)
            z[5:10] = 0.05 * tol / rho  # just under the threshold
            w, Q = dpr1_eig(d.copy(), z.copy(), rho)
            A = np.diag(d) + rho * np.outer(z, z)
            rec = (np.linalg.norm(Q @ np.diag(w) @ Q.T - A)
                   / np.linalg.norm(A))
            assert rec < 5e-14, f"rho={rho}: {rec:.2e}"
            assert np.linalg.norm(Q.T @ Q - np.eye(n)) < 1e-13


class TestExpansionCounter:
    def test_gd_counts_expansions(self):
        import slepc_tpu as stt
        from slepc_tpu.st.st import STPrecond
        from slepc_tpu.sys.sort import Which as W

        n = 1200
        d = np.linspace(10, 30, n).astype(np.float64)
        d[:3] = [1.0, 2.0, 3.0]
        lo = np.zeros(n)
        hi = np.zeros(n)
        hi[:-1] = -1.0
        lo[1:] = -1.0
        from slepc_tpu.mat.linop import DIAOperator

        A = DIAOperator((-1, 0, 1), np.stack([lo, d, hi]))
        for fused in (True, False):
            eps = stt.EPS(A, problem_type="hep", which=W.SMALLEST_REAL,
                          nev=3, ncv=24, max_it=60, tol=1e-6, solver="gd")
            eps.set_st(STPrecond([A]))
            eps.gd_fused = fused
            eps.solve()
            assert eps.nconv >= 3
            assert eps.expansions > 0


class TestDSRotateKernel:
    """Double-single Pallas restart rotation (ops/rotate_pallas.py).

    Reference role: BVMultInPlace restart update (bvops.c) under
    krylovschur.c restarts; on TPU the XLA f64-emulated dot_general
    materializes 8-way split temporaries in HBM — the kernel keeps them
    in VMEM (tools/DIAG_NOTES.md round-5: rotation = dominant non-apply
    flagship cost)."""

    def test_kernel_matches_f64_einsum(self):
        from slepc_tpu.ops.rotate_pallas import rotate_basis_ds

        rng = np.random.default_rng(7)
        K, P, R, W = 24, 18, 16, 256
        V = jnp.asarray(rng.standard_normal((K, R, W)))
        Qm, _ = np.linalg.qr(rng.standard_normal((K, K)))
        Q = jnp.asarray(Qm[:, :P])
        out = rotate_basis_ds(Q, V, block_rows=8, interpret=True)
        ref = np.einsum("kp,krw->prw", np.asarray(Q), np.asarray(V))
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        assert err < 5e-14, err

    def test_kernel_nonuniform_block_rows(self):
        from slepc_tpu.ops.rotate_pallas import rotate_basis_ds

        rng = np.random.default_rng(8)
        K, P, R, W = 6, 4, 12, 128  # R not divisible by default Rb=16
        V = jnp.asarray(rng.standard_normal((K, R, W)))
        Q = jnp.asarray(rng.standard_normal((K, P)) / K)
        out = rotate_basis_ds(Q, V, interpret=True)
        ref = np.einsum("kp,krw->prw", np.asarray(Q), np.asarray(V))
        assert np.abs(np.asarray(out) - ref).max() < 1e-13

    def test_cycle_rot_mode_ds_matches_exact(self):
        """Full jitted KS cycle with rot_mode='ds' reproduces the exact
        -rotation cycle's Ritz values on a padded f64 operator."""
        from slepc_tpu.eps.ks_jit import ks_hep_cycle
        from slepc_tpu.ops.dia_pallas import DIAPaddedOperator

        side = 24
        A = laplacian_2d(side, side, dtype=np.float64)
        op = DIAPaddedOperator.from_dia(A, block_rows=8)
        ncv = 10
        rng = np.random.default_rng(5)
        v0 = rng.standard_normal(side * side)
        vp = op.pad2d(jnp.asarray(v0 / np.linalg.norm(v0)))
        V = jnp.zeros((ncv + 1,) + vp.shape, jnp.float64).at[0].set(vp)
        H = jnp.zeros((ncv + 1, ncv), jnp.float64)
        key = jax.random.PRNGKey(0)
        args = (V, H, jnp.asarray(0), jnp.asarray(1e-8), key)
        out_e = jax.jit(lambda *a: ks_hep_cycle(
            op, *a, ncv=ncv, which="smallest"))(*args)
        out_d = jax.jit(lambda *a: ks_hep_cycle(
            op, *a, ncv=ncv, which="smallest", rot_mode="ds"))(*args)
        # identical math to DS accuracy: basis and Ritz values agree
        assert np.abs(np.asarray(out_e[4]) -
                      np.asarray(out_d[4])).max() < 1e-11
        assert np.abs(np.asarray(out_e[0]) -
                      np.asarray(out_d[0])).max() < 1e-11

    def test_cheb_driver_certifies_with_ds_rotation(self):
        """The lock-and-adapt cheb driver (the path that REJECTED the
        f32-plane rotation modes, tools/DIAG_NOTES.md r5) certifies at
        full quality with the DS kernel; the traced-call probe proves
        the kernel path actually ran (a padded operator is required for
        the 3-D basis — a raw DIA falls back to exact by design)."""
        import slepc_tpu.ops.rotate_pallas as rp
        from slepc_tpu.eps.cheb_accel import ks_cheb_smallest
        from slepc_tpu.ops.dia_pallas import DIAPaddedOperatorDS

        calls = []
        orig = rp.rotate_basis_ds
        rp.rotate_basis_ds = lambda *a, **k: (calls.append(1),
                                              orig(*a, **k))[1]
        try:
            side = 60
            A = laplacian_2d(side, side, dtype=np.float64)
            op = DIAPaddedOperatorDS.from_dia(A, block_rows=8)
            exact = laplacian_2d_eigs(side, side, k=8)
            res = ks_cheb_smallest(op, nev=8, tol=1e-8, ncv=24, degree=60,
                                   rot_mode="ds", key=jax.random.PRNGKey(3))
        finally:
            rp.rotate_basis_ds = orig
        assert len(calls) >= 1  # the DS kernel path really traced
        assert res["nconv"] >= 8
        assert np.abs(np.sort(res["lam"][:8]) - exact).max() < 1e-10
        assert np.max(res["resid"][:8]) < 1e-8

    def test_kernel_chunked_large_basis_path(self):
        """Force the row-chunked tier (plane-temp budget) and check it
        matches the unchunked kernel and f64 einsum exactly."""
        import slepc_tpu.ops.rotate_pallas as rp

        rng = np.random.default_rng(9)
        K, P, R, W = 8, 6, 72, 128  # uneven tail: 72 = 2*32 + 8
        V = jnp.asarray(rng.standard_normal((K, R, W)))
        Q = jnp.asarray(rng.standard_normal((K, P)) / K)
        ref = np.einsum("kp,krw->prw", np.asarray(Q), np.asarray(V))
        old = rp._PLANE_CHUNK_BYTES
        rp._PLANE_CHUNK_BYTES = 2 * K * 32 * W * 4 // 2  # ~32-row chunks
        try:
            out = rp.rotate_basis_ds(Q, V, block_rows=8, interpret=True)
        finally:
            rp._PLANE_CHUNK_BYTES = old
        assert np.abs(np.asarray(out) - ref).max() < 1e-13
