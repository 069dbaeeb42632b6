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


def test_dryrun_multichip_entry():
    """The driver-facing dry run compiles + executes on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, len(jax.devices())))
