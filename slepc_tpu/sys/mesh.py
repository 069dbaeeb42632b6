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


_distributed_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) runtime initialization.

    Reference role: the MPI world communicator every SLEPc object lives on
    (SlepcInitialize, src/sys/slepcinit.c:255).  On TPU pods, one process
    drives each host; ``jax.distributed.initialize`` wires them into one
    runtime whose ``jax.devices()`` spans every chip.  Safe to call on a
    single host (no-op unless coordination parameters are provided via
    arguments or the standard JAX_COORDINATOR_ADDRESS / cloud-TPU
    auto-detection).  Returns True when a multi-process runtime is live.

    Sharding guidance (docs/tpu.md): keep the "rows" axis ordered so
    neighboring row shards sit on ICI-adjacent chips of the same host —
    the DIA halo exchange is a ring ppermute whose boundary traffic rides
    ICI; only the ~2 shard-boundary rows per host cross DCN, and the
    fused one-psum reductions cross DCN once per cycle.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_count() > 1
    import os

    explicit = coordinator_address is not None \
        or os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("COORDINATOR_ADDRESS")
    if not explicit and num_processes is None:
        return False  # single-process run: nothing to wire
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _distributed_initialized = True
    return jax.process_count() > 1


def make_multihost_row_mesh() -> Mesh:
    """1-D "rows" mesh over EVERY chip in the (possibly multi-host)
    runtime, ordered host-major so each host owns a contiguous row range
    (halo neighbors differ across DCN only at host boundaries)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs).reshape(-1), (ROWS,))


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

    Sizes not divisible by the mesh stay replicated (uneven explicit
    shardings are rejected by device_put; padding support is planned).
    """
    mesh = mesh if mesh is not None else _mesh
    s = row_sharding(np.ndim(x), mesh)
    if s is None or np.shape(x)[0] % mesh.shape[ROWS] != 0:
        return jax.device_put(x)
    return jax.device_put(x, s)


def device_put_basis_t(x, mesh: Optional[Mesh] = None):
    """Place a TRANSPOSED basis (m, n) with its LAST axis sharded over the
    row mesh (the jitted Krylov cycle stores V^T so the long axis rides
    the TPU lane dimension; on a mesh the n axis still shards by rows)."""
    mesh = mesh if mesh is not None else _mesh
    if mesh is None or np.shape(x)[-1] % mesh.shape[ROWS] != 0:
        return jax.device_put(x)
    spec = P(*([None] * (np.ndim(x) - 1)), ROWS)
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_operator(op, mesh: Optional[Mesh] = None):
    """Place an operator's constituent arrays row-sharded on the mesh.

    DIA: diagonals sharded along their length; AIJ: row-blocked data and
    indices (the gather of x stays global — GSPMD inserts the all-gather,
    the halo-ppermute specialization is the optimized path); Dense: rows.
    Returns the same operator object with device-placed arrays.
    """
    import jax as _jax

    from ..mat.linop import AIJOperator, DenseOperator, DIAOperator

    mesh = mesh if mesh is not None else _mesh
    if mesh is None:
        return op
    k = mesh.shape[ROWS]
    if op.shape[0] % k != 0:
        # uneven shardings need padding support (planned); stay replicated
        return op
    if isinstance(op, DIAOperator):
        op.diags = _jax.device_put(op.diags, NamedSharding(mesh, P(None, ROWS)))
        if op.dp is not None:
            op.dp = _jax.device_put(op.dp, NamedSharding(mesh, P(None, ROWS, None)))
    elif isinstance(op, AIJOperator):
        s = NamedSharding(mesh, P(ROWS, None))
        op.indices = _jax.device_put(op.indices, s)
        op.data = _jax.device_put(op.data, s)
        if op.indices_t is not None:
            op.indices_t = _jax.device_put(op.indices_t, s)
            op.data_t = _jax.device_put(op.data_t, s)
    elif isinstance(op, DenseOperator):
        op.A = _jax.device_put(op.A, NamedSharding(mesh, P(ROWS, None)))
    return op


def nrows_padded(n: int, mesh: Optional[Mesh] = None) -> int:
    """Round n up so each mesh shard gets an equal number of rows."""
    mesh = mesh if mesh is not None else _mesh
    if mesh is None:
        return n
    k = mesh.shape[ROWS]
    return ((n + k - 1) // k) * k
