"""Device mesh and sharding helpers.

The distribution backbone.  The reference row-partitions every Mat/Vec/BV
over an MPI communicator (reference: include/slepc/private/bvimpl.h n/N
fields; PETSc layouts) and communicates with explicit MPI.  Here the single
equivalent mechanism is a 1-D ``jax.sharding.Mesh`` axis named ``"rows"``:
vectors of global length n and bases of shape (n, m) carry a
``NamedSharding`` partitioned on their first dimension, and every jitted
computation lets XLA/GSPMD insert the psum / all-gather /
collective-permute that the reference issues as MPI_Allreduce / VecScatter.

Subcommunicator task parallelism (spectrum slicing partitions, CISS
integration points — reference: src/sys/slepccontour.c, ks-slice.c) maps to
splitting the mesh into independent sub-meshes; helpers for that live with
the consumers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"

_mesh: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    """Install the global 1-D row mesh (None → single-device mode)."""
    global _mesh
    _mesh = mesh


def make_row_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (ROWS,))


def get_mesh() -> Optional[Mesh]:
    return _mesh


def row_sharding(ndim: int = 1, mesh: Optional[Mesh] = None) -> Optional[NamedSharding]:
    """Sharding that partitions dim 0 over "rows"; other dims replicated."""
    mesh = mesh if mesh is not None else _mesh
    if mesh is None:
        return None
    return NamedSharding(mesh, P(ROWS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Optional[Mesh] = None) -> Optional[NamedSharding]:
    mesh = mesh if mesh is not None else _mesh
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def device_put_rows(x, mesh: Optional[Mesh] = None):
    """Place an array with its first axis sharded over the row mesh.

    Pads nothing: callers are expected to size n as a multiple of the mesh
    when they care; jax handles uneven shardings for pjit inputs.
    """
    s = row_sharding(np.ndim(x), mesh)
    if s is None:
        return jax.device_put(x)
    return jax.device_put(x, s)


def nrows_padded(n: int, mesh: Optional[Mesh] = None) -> int:
    """Round n up so each mesh shard gets an equal number of rows."""
    mesh = mesh if mesh is not None else _mesh
    if mesh is None:
        return n
    k = mesh.shape[ROWS]
    return ((n + k - 1) // k) * k
