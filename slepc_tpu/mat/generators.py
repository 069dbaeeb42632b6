"""Test/benchmark matrix generators.

The reference's tutorials construct their operators inline (1-D/2-D
Laplacians in src/eps/tutorials/ex1.c / ex2.c; Markov chain ex5.c; etc.) or
load PETSc binary files from share/slepc/datafiles/matrices.  Here the
standard discrete Laplacians are first-class DIA operators — the format that
makes their SpMV pure streaming on TPU.
"""

from __future__ import annotations

import numpy as np

from .linop import AIJOperator, DenseOperator, DIAOperator, LinearOperator


def laplacian_1d(n: int, dtype=np.float64) -> DIAOperator:
    """Tridiagonal 1-D Laplacian, eigenvalues 2-2cos(k*pi/(n+1)).

    Reference analog: src/eps/tutorials/ex1.c (stiffness matrix of the
    1-D Laplacian).
    """
    main = np.full(n, 2.0, dtype=dtype)
    lo = np.zeros(n, dtype=dtype)
    hi = np.zeros(n, dtype=dtype)
    hi[: n - 1] = -1.0  # entry A[i, i+1] stored at row i
    lo[1:] = -1.0  # entry A[i, i-1] stored at row i
    return DIAOperator((-1, 0, 1), np.stack([lo, main, hi]))


def laplacian_2d(nx: int, ny: int | None = None, dtype=np.float64) -> DIAOperator:
    """5-point 2-D Laplacian on an nx x ny grid (row-major x fastest).

    Reference analog: src/eps/tutorials/ex2.c.
    """
    if ny is None:
        ny = nx
    n = nx * ny
    main = np.full(n, 4.0, dtype=dtype)
    ix = np.arange(n) % nx
    # x-neighbors: A[i, i±1] unless crossing an x-boundary
    east = np.where(ix < nx - 1, -1.0, 0.0).astype(dtype)
    west = np.where(ix > 0, -1.0, 0.0).astype(dtype)
    # y-neighbors: A[i, i±nx]
    north = np.zeros(n, dtype=dtype)
    north[: n - nx] = -1.0
    south = np.zeros(n, dtype=dtype)
    south[nx:] = -1.0
    return DIAOperator(
        (-nx, -1, 0, 1, nx), np.stack([south, west, main, east, north])
    )


def laplacian_3d(nx: int, ny: int | None = None, nz: int | None = None,
                 dtype=np.float64) -> DIAOperator:
    """7-point 3-D Laplacian (x fastest, then y, then z)."""
    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    n = nx * ny * nz
    main = np.full(n, 6.0, dtype=dtype)
    ix = np.arange(n) % nx
    iy = (np.arange(n) // nx) % ny
    east = np.where(ix < nx - 1, -1.0, 0.0).astype(dtype)
    west = np.where(ix > 0, -1.0, 0.0).astype(dtype)
    north = np.where(iy < ny - 1, -1.0, 0.0).astype(dtype)
    south = np.where(iy > 0, -1.0, 0.0).astype(dtype)
    up = np.zeros(n, dtype=dtype)
    up[: n - nx * ny] = -1.0
    down = np.zeros(n, dtype=dtype)
    down[nx * ny:] = -1.0
    return DIAOperator(
        (-nx * ny, -nx, -1, 0, 1, nx, nx * ny),
        np.stack([down, south, west, main, east, north, up]),
    )


def laplacian_3d_device(nx: int, ny: int | None = None, nz: int | None = None,
                        dtype=np.float64, block_rows: int = 128):
    """7-point 3-D Laplacian as a padded Pallas operator with diagonals
    GENERATED ON DEVICE.

    Host->device uploads through the axon relay run at ~1-5 MB/s: at 10M
    rows the host-built diagonal route of :func:`laplacian_3d` stalls for
    minutes, while the stencil values here are pure index functions that
    materialize on-chip in milliseconds.  f64 returns the double-single
    operator (the stencil values are integers, so hi == value and lo == 0
    EXACTLY — no split error); f32 returns the plain padded operator.

    Reference analog: the inline operator assembly of
    src/eps/tutorials/ex2.c generalized to 3-D.
    """
    import jax.numpy as jnp

    from ..ops.dia_pallas import (DIAPaddedOperator, DIAPaddedOperatorDS,
                                  prepare_diags)

    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    n = nx * ny * nz
    i = jnp.arange(n, dtype=jnp.int32)
    ix = i % nx
    iy = (i // nx) % ny
    iz = i // (nx * ny)
    f32 = jnp.float32
    main = jnp.full((n,), 6.0, f32)
    east = jnp.where(ix < nx - 1, -1.0, 0.0).astype(f32)
    west = jnp.where(ix > 0, -1.0, 0.0).astype(f32)
    north = jnp.where(iy < ny - 1, -1.0, 0.0).astype(f32)
    south = jnp.where(iy > 0, -1.0, 0.0).astype(f32)
    up = jnp.where(iz < nz - 1, -1.0, 0.0).astype(f32)
    down = jnp.where(iz > 0, -1.0, 0.0).astype(f32)
    diags = jnp.stack([down, south, west, main, east, north, up])
    offsets = (-nx * ny, -nx, -1, 0, 1, nx, nx * ny)
    dp = prepare_diags(diags, n, block_rows)
    if np.dtype(dtype) == np.dtype(np.float64):
        return DIAPaddedOperatorDS(offsets, dp, jnp.zeros_like(dp), n,
                                   block_rows)
    return DIAPaddedOperator(offsets, dp, n, block_rows)


def laplacian_1d_eigs(n: int, k: int | None = None) -> np.ndarray:
    """Closed-form eigenvalues of laplacian_1d, ascending."""
    j = np.arange(1, n + 1)
    ev = 2.0 - 2.0 * np.cos(j * np.pi / (n + 1))
    return ev if k is None else ev[:k]


def laplacian_2d_eigs(nx: int, ny: int | None = None, k: int | None = None) -> np.ndarray:
    """Closed-form eigenvalues of laplacian_2d, ascending."""
    if ny is None:
        ny = nx
    ex = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    ey = 2.0 - 2.0 * np.cos(np.arange(1, ny + 1) * np.pi / (ny + 1))
    ev = np.sort((ex[:, None] + ey[None, :]).ravel())
    return ev if k is None else ev[:k]


def laplacian_3d_eigs(nx: int, ny: int | None = None, nz: int | None = None,
                      k: int | None = None) -> np.ndarray:
    """Closed-form eigenvalues of the 7-point 3-D Laplacian, ascending.

    For small k only the low-index corner of the (i,j,l) lattice can
    contain the smallest combinations (eigenvalues are monotone in each
    index), so the outer sum is truncated per axis."""
    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    mx = nx if k is None else min(k + 1, nx)
    my = ny if k is None else min(k + 1, ny)
    mz = nz if k is None else min(k + 1, nz)
    ex = 2.0 - 2.0 * np.cos(np.arange(1, mx + 1) * np.pi / (nx + 1))
    ey = 2.0 - 2.0 * np.cos(np.arange(1, my + 1) * np.pi / (ny + 1))
    ez = 2.0 - 2.0 * np.cos(np.arange(1, mz + 1) * np.pi / (nz + 1))
    ev = np.sort((ex[:, None, None] + ey[None, :, None]
                  + ez[None, None, :]).ravel())
    return ev if k is None else ev[:k]


def markov(m: int, dtype=np.float64) -> AIJOperator:
    """Markov chain transition matrix on a triangular grid.

    Reference analog: src/eps/tutorials/ex5.c MatMarkovModel (non-symmetric
    test operator with known dominant eigenvalue 1).
    """
    import scipy.sparse as sp

    N = m * (m + 1) // 2
    cst = 0.5 / (m - 1)
    rows, cols, vals = [], [], []
    ix = 0
    for i in range(1, m + 1):
        jmax = m - i + 1
        for j in range(1, jmax + 1):
            ix += 1
            if j != jmax:
                pd = cst * (i + j - 1)
                # north
                rows.append(ix - 1)
                cols.append(ix)
                vals.append(2 * pd if i == 1 else pd)
                # east
                rows.append(ix - 1)
                cols.append(ix + jmax - 1)
                vals.append(2 * pd if j == 1 else pd)
            pu = 0.5 - cst * (i + j - 3)
            # south
            if j > 1:
                rows.append(ix - 1)
                cols.append(ix - 2)
                vals.append(pu)
            # west
            if i > 1:
                rows.append(ix - 1)
                cols.append(ix - jmax - 2)
                vals.append(pu)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N), dtype=dtype)
    return AIJOperator.from_scipy(A)


def from_scipy(A, dtype=None, **kw) -> AIJOperator:
    return AIJOperator.from_scipy(A, dtype=dtype, **kw)


def from_dense(A) -> DenseOperator:
    return DenseOperator(A)


def random_sparse(n: int, m: int | None = None, density: float = 0.01,
                  seed: int = 0, dtype=np.float64, symmetric: bool = False) -> AIJOperator:
    """Random sparse test matrix (deterministic at fixed seed)."""
    import scipy.sparse as sp

    m = n if m is None else m
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=rng, dtype=np.float64).astype(dtype)
    if symmetric:
        A = (A + A.T) * 0.5
    return AIJOperator.from_scipy(sp.csr_matrix(A))
