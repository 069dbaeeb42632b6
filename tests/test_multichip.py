"""Multi-device (8 virtual CPU devices) correctness tests.

The distribution model (SURVEY §2.13): 1-D row sharding over a "rows"
mesh axis, XLA/GSPMD inserting the psum/all-gather/collective-permute that
the reference performs with MPI.  These tests assert bit-level solver
correctness with genuinely sharded operators and bases.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import slepc_tpu as st
from slepc_tpu.sys import mesh as meshmod


@pytest.fixture
def row_mesh():
    devs = np.asarray(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    m = Mesh(devs.reshape(-1), ("rows",))
    meshmod.set_mesh(m)
    yield m
    meshmod.set_mesh(None)


def test_sharded_spmv_matches(row_mesh):
    n = 1024
    A = st.laplacian_1d(n)
    As = A.to_scipy()
    meshmod.shard_operator(A, row_mesh)
    x = np.random.default_rng(0).standard_normal(n)
    xj = jax.device_put(jnp.asarray(x), NamedSharding(row_mesh, P("rows")))
    y = np.asarray(jax.jit(A.mult)(xj))
    np.testing.assert_allclose(y, As @ x, rtol=1e-12)


@pytest.mark.slow
def test_sharded_eps_fast_path(row_mesh):
    """Jitted Krylov-Schur cycle with a sharded basis + operator.

    smallest end of the 1-D Laplacian: O(1) relative gaps -> quick
    convergence (the clustered largest end is a shift-invert job)."""
    n = 128
    A = st.laplacian_1d(n)
    meshmod.shard_operator(A, row_mesh)
    exact = st.mat.generators.laplacian_1d_eigs(n)
    eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=4, ncv=48,
                 max_it=400)
    eps.solve()
    assert eps.nconv >= 4
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real),
                               exact[:4], rtol=1e-7)


def test_sharded_eps_general_path(row_mesh):
    """Host-orchestrated NHEP path with sharded AIJ operator."""
    A = st.mat.generators.markov(15)  # N=120, divisible by 8 devices
    meshmod.shard_operator(A, row_mesh)
    eps = st.EPS(A, problem_type="nhep", which="largest_magnitude", nev=3)
    eps.solve()
    assert eps.nconv >= 3
    assert abs(np.max(np.abs(eps.eigenvalues[:3])) - 1.0) < 1e-6


def test_sharded_svd(row_mesh):
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    As = sp.random(512, 256, density=0.02, random_state=rng, format="csr")
    A = st.from_scipy(As)
    meshmod.shard_operator(A, row_mesh)
    s_ref = np.linalg.svd(As.toarray(), compute_uv=False)
    svd = st.SVD(A, nsv=3, solver="trlanczos")
    svd.solve()
    np.testing.assert_allclose(svd.sigma[:3], s_ref[:3], rtol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """The driver-facing dry run compiles + executes on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, len(jax.devices())))


def test_halo_spmv_matches_and_avoids_allgather(row_mesh):
    """Explicit ppermute halo exchange: exact vs single-device DIA mult,
    and the compiled HLO contains collective-permute, NOT all-gather."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from slepc_tpu.parallel import HaloDIAOperator, dia_spmv_halo
    from slepc_tpu.sys.mesh import ROWS

    A = st.laplacian_2d(40, 40)
    x = np.random.default_rng(0).standard_normal(A.shape[0])
    y_ref = np.asarray(A.mult(jnp.asarray(x)))
    H = HaloDIAOperator.from_dia(A, row_mesh)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(row_mesh, P(ROWS)))
    np.testing.assert_allclose(np.asarray(H.mult(xs)), y_ref, atol=1e-12)
    hlo = jax.jit(functools.partial(
        dia_spmv_halo, offsets=A.offsets, mesh=row_mesh)).lower(
        H.diags, xs).compile().as_text()
    assert hlo.count("collective-permute") >= 1
    assert hlo.count("all-gather") == 0


def test_halo_ks_cycle_end_to_end(row_mesh):
    """The jitted Krylov-Schur cycle over a HaloDIAOperator converges to
    the closed-form eigenvalues with the basis sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slepc_tpu.eps.ks_jit import ks_hep_cycle
    from slepc_tpu.mat.generators import laplacian_2d_eigs
    from slepc_tpu.parallel import HaloDIAOperator
    from slepc_tpu.sys.mesh import ROWS

    # non-square grid: distinct eigenvalues (square grids have multiplicity
    # 2, unreachable by single-vector Krylov); n=960 divisible by 8
    A = st.laplacian_2d(32, 30)
    H = HaloDIAOperator.from_dia(A, row_mesh)
    n, ncv = A.shape[0], 24
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal(n)
    v0 /= np.linalg.norm(v0)
    V = jnp.zeros((ncv + 1, n)).at[0].set(jnp.asarray(v0))
    V = jax.device_put(V, NamedSharding(row_mesh, P(None, ROWS)))
    Hm = jnp.zeros((ncv + 1, ncv))
    j0 = jnp.asarray(0)
    key = jax.random.PRNGKey(0)
    k2 = 0
    for _ in range(60):
        V, Hm, j0, k2, theta, errest, beta = ks_hep_cycle(
            H, V, Hm, j0, 1e-10, key, ncv=ncv, which="largest")
        if int(k2) >= 4:
            break
    exact = laplacian_2d_eigs(32, 30)[::-1][:4]
    np.testing.assert_allclose(np.asarray(theta)[:4], exact, rtol=1e-9)


def test_ciss_batched_task_parallel(row_mesh):
    """Contour-point solves batched in one jitted vmapped program with the
    point axis sharded over a task mesh — the TPU-native analog of the
    reference's per-subcomm CISS point parallelism (slepccontour.c:85)."""
    import jax
    from jax.sharding import Mesh

    from slepc_tpu.parallel.tasks import batched_shifted_solves, make_task_mesh

    n = 120
    A = st.laplacian_1d(n)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 4))
    rg = st.RGEllipse(center=0.65, radius=0.16, vscale=0.3)
    z, w = rg.contour(16)
    mesh = make_task_mesh(8)
    Y = np.asarray(batched_shifted_solves(A, None, z, V, tol=1e-12,
                                          mesh=mesh))
    # verify one point against a dense solve
    Ad = np.asarray(A.to_dense())
    for j in (0, 7):
        Yref = np.linalg.solve(z[j] * np.eye(n) - Ad, V.astype(complex))
        np.testing.assert_allclose(Y[j], Yref, atol=1e-7)
    # end-to-end: CISS with the batched strategy matches the factorized one
    eps = st.EPS(A, problem_type="hep", solver="ciss", tol=1e-9)
    eps.ciss_solver = "batched"
    eps.ciss_task_mesh = mesh
    eps.set_rg(rg)
    eps.solve()
    exact = st.mat.generators.laplacian_1d_eigs(n)
    inside = np.sort(exact[np.abs(exact - 0.65) < 0.16])
    assert eps.nconv == len(inside)
    np.testing.assert_allclose(np.sort(eps.eigenvalues.real), inside,
                               rtol=1e-7)


def test_tsqr_shard_map(row_mesh):
    """Two-stage TSQR over the rows mesh: local QR + all-gather of the
    small R factors + replicated combine (the reference's TSQR custom
    MPI reduction, bvlapack.c:347-560)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slepc_tpu.bv.orthog import tsqr_shard_map
    from slepc_tpu.sys.mesh import ROWS

    rng = np.random.default_rng(0)
    n, m = 512, 12
    X = rng.standard_normal((n, m))
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(row_mesh, P(ROWS, None)))
    Q, R = tsqr_shard_map(Xs, row_mesh)
    Qn, Rn = np.asarray(Q), np.asarray(R)
    np.testing.assert_allclose(Qn.T @ Qn, np.eye(m), atol=1e-12)
    np.testing.assert_allclose(Qn @ Rn, X, atol=1e-12)
    # R upper triangular up to sign conventions
    assert np.abs(np.tril(Rn, -1)).max() < 1e-12
    # communication structure: one all-gather, no full-matrix gathers
    hlo = jax.jit(lambda v: tsqr_shard_map(v, row_mesh)).lower(Xs).compile().as_text()
    assert hlo.count("all-gather") >= 1


def test_sharded_pallas_dia_spmv(row_mesh):
    """The single-chip Pallas padded DIA kernel under shard_map: exact
    SpMV with ppermute boundary-row halo (collective-permute in the HLO,
    no all-gather) and zero-copy chaining (reference VecScatter analog:
    PETSc MatMult_MPIAIJ feeding bvops.c:862)."""
    import functools

    from slepc_tpu.parallel.halo_pallas import (ShardedDIAPaddedOperator,
                                                dia_spmv_padded_sharded)

    A = st.laplacian_2d(64, 64, dtype=np.float32)
    As = A.to_scipy()
    op = ShardedDIAPaddedOperator.from_dia(A, row_mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    xp = op.pad2d(x)
    yp = op.mult2d(xp)
    ref = As @ x
    np.testing.assert_allclose(op.unpad(yp), ref, rtol=1e-5, atol=1e-5)
    # chaining: output halo is zero, feeds back in directly
    np.testing.assert_allclose(op.unpad(op.mult2d(yp)), As @ ref,
                               rtol=1e-4, atol=1e-4)
    hlo = jax.jit(functools.partial(
        dia_spmv_padded_sharded, op.offsets, nloc=op.nloc,
        block_rows=op.block_rows, mesh=op.mesh)).lower(
        op.dp, xp).compile().as_text()
    assert hlo.count("collective-permute") >= 2
    assert hlo.count("all-gather") == 0


def test_sharded_pallas_ks_end_to_end(row_mesh):
    """EPS auto-selects the sharded padded operator when a mesh is set;
    the whole jitted KS cycle runs on stacked local padded slabs."""
    from slepc_tpu.mat.generators import laplacian_2d_eigs

    A = st.laplacian_2d(64, 64, dtype=np.float32)
    exact = laplacian_2d_eigs(64, 64, k=4)
    eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=4,
                 ncv=32, max_it=300, tol=1e-5)
    eps.solve()
    assert eps.nconv >= 4
    np.testing.assert_allclose(np.sort(eps.eigenvalues[:4].real), exact[:4],
                               rtol=1e-3)


def test_slice_submeshes_disjoint():
    """Slicing partition sub-meshes are disjoint contiguous device groups
    (the subcommunicator analog, ks-slice.c:341-416)."""
    from slepc_tpu.parallel.tasks import slice_submeshes, thread_map_submesh

    meshes = slice_submeshes(4)
    assert meshes is not None and len(meshes) == 4
    seen = set()
    for m in meshes:
        ids = {d.id for d in m.devices.flat}
        assert not (ids & seen)
        seen |= ids
    # more partitions than devices: groups cap at the device count
    meshes9 = slice_submeshes(9)
    assert meshes9 is not None and len(meshes9) <= 8
    # tasks actually run under their pinned device and return in order
    out = thread_map_submesh(lambda v: v * 2, [1, 2, 3, 4, 5], meshes)
    assert out == [2, 4, 6, 8, 10]
    assert slice_submeshes(1) is None
