"""Task parallelism over mesh sub-axes and host threads.

Reference: SLEPc's subcommunicator machinery (SURVEY.md 2.13-5) — three
independent uses: (a) spectrum-slicing interval partitions
(ks-slice.c npart), (b) CISS integration points (slepccontour.c:85-168),
(c) Newton-refinement per-eigenpair subcomms.

TPU mapping (single-controller SPMD):
  * device-iterative inner solves batch over the task dimension inside
    ONE jitted program (vmap); sharding the task axis over a mesh axis
    'tasks' makes GSPMD place independent tasks on disjoint device
    groups — the mesh-sub-axis analog of PetscSubcomm,
  * host factorizations (scipy splu / native LDL^T) parallelize over a
    thread pool — the per-subcomm redundant-factorization pattern on the
    host tier (factorization kernels release the GIL).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TASKS = "tasks"


def make_task_mesh(ntasks: Optional[int] = None) -> Mesh:
    """1-D mesh over the task axis (quadrature points, slicing
    partitions); ntasks defaults to all visible devices."""
    devs = np.asarray(jax.devices())
    if ntasks is not None:
        devs = devs[:ntasks]
    return Mesh(devs.reshape(-1), (TASKS,))


def batched_shifted_solves(A, B, z: np.ndarray, RHS, *, tol: float = 1e-10,
                           maxiter: int = 1000,
                           mesh: Optional[Mesh] = None):
    """Y[j] = (z_j B - A)^{-1} RHS for all contour points j, as ONE jitted
    vmapped iterative solve (matrix-free BiCGStab with point-wise Jacobi
    preconditioning).  With a mesh, the point axis is sharded over its
    'tasks' axis so independent points run on disjoint device groups —
    the TPU-native equivalent of the reference's per-subcomm KSP solves
    (SlepcContourRedundantMat + ciss.c:283-316).

    A, B: jittable LinearOperators (B=None means identity).  RHS: (n, L).
    Returns Y with shape (npt, n, L), complex.
    """
    n, L = RHS.shape
    npt = len(z)
    zj = jnp.asarray(np.asarray(z, dtype=complex))
    Rc = jnp.asarray(np.asarray(RHS, dtype=complex))

    # point-wise Jacobi preconditioner from operator diagonals
    diagA = _op_diag(A, n)
    diagB = _op_diag(B, n) if B is not None else jnp.ones(n)

    def solve_one(zk):
        def mv(x):
            bx = B.mult(x) if B is not None else x
            return zk * bx - A.mult(x)

        d = zk * diagB - diagA
        dinv = jnp.where(jnp.abs(d) > 1e-300, 1.0 / d, 1.0)

        def prec(x):
            return dinv[:, None] * x

        x, _ = jax.scipy.sparse.linalg.bicgstab(
            mv, Rc, tol=tol, atol=0.0, maxiter=maxiter, M=prec)
        return x

    fn = jax.jit(jax.vmap(solve_one))
    if mesh is not None and npt % mesh.shape[TASKS] == 0:
        zj = jax.device_put(zj, NamedSharding(mesh, P(TASKS)))
        out_shard = NamedSharding(mesh, P(TASKS, None, None))
        fn = jax.jit(jax.vmap(solve_one), out_shardings=out_shard)
    return fn(zj)


def _bicgstab_block_counted(A, B, zj, Rc, diagA, diagB, tol, maxiter):
    """Vmapped block BiCGStab over contour points with an ITERATION
    COUNTER in the carry (jax.scipy's solver reports none).  The (n, L)
    block RHS is treated as one long vector (single Krylov sequence per
    point — same contract as jax.scipy bicgstab on a matrix operand).
    Returns (Y (npt, n, L), iters (npt,))."""

    def solve_one(zk):
        def mv(x):
            bx = B.mult(x) if B is not None else x
            return zk * bx - A.mult(x)

        d = zk * diagB - diagA
        dinv = jnp.where(jnp.abs(d) > 1e-300, 1.0 / d, 1.0)

        def prec(x):
            return dinv[:, None] * x

        b = Rc
        bnorm = jnp.linalg.norm(b)
        atol2 = (tol * bnorm) ** 2
        x0 = jnp.zeros_like(b)
        r0 = b
        rhat = r0

        def vdot(a, c):
            return jnp.sum(a.conj() * c)

        def cond(st):
            x, r, rh, p, v, rho, alpha, omega, k = st
            return jnp.logical_and(k < maxiter,
                                   vdot(r, r).real > atol2)

        def body(st):
            x, r, rh, p, v, rho, alpha, omega, k = st
            rho1 = vdot(rh, r)
            beta = (rho1 / jnp.where(rho == 0, 1, rho)) \
                * (alpha / jnp.where(omega == 0, 1, omega))
            p = r + beta * (p - omega * v)
            phat = prec(p)
            v = mv(phat)
            denom = vdot(rh, v)
            alpha = rho1 / jnp.where(denom == 0, 1, denom)
            s = r - alpha * v
            shat = prec(s)
            t = mv(shat)
            tt = vdot(t, t)
            omega = vdot(t, s) / jnp.where(tt == 0, 1, tt)
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            return x, r, rh, p, v, rho1, alpha, omega, k + 1

        one = jnp.ones((), Rc.dtype)
        st = (x0, r0, rhat, jnp.zeros_like(b), jnp.zeros_like(b),
              one, one, one, jnp.zeros((), jnp.int32))
        x, r, *_, k = jax.lax.while_loop(cond, body, st)
        return x, k

    return jax.jit(jax.vmap(solve_one))(zj)


def batched_shifted_solves_adaptive(A, B, z: np.ndarray, RHS, *,
                                    tols: np.ndarray, maxiter: int = 1000,
                                    nbuckets: int = 3):
    """Per-point-tolerance contour solves: points are grouped into
    tolerance decades and each bucket runs its own vmapped BiCGStab, so
    loose points genuinely stop earlier (inside ONE vmap the while_loop
    is lockstep — bucketing is what converts per-point tolerances into
    saved matvecs).  Reference role: the per-point inner-KSP tolerance
    control of the contour machinery (slepccontour.c:22-118,
    ciss.c:283-316).

    Returns (Y (npt, n, L) complex, info dict with per-bucket iteration
    counts and the weighted total ``inner_iters``).
    """
    n, L = RHS.shape
    npt = len(z)
    zc = np.asarray(z, dtype=complex)
    Rc = jnp.asarray(np.asarray(RHS, dtype=complex))
    diagA = _op_diag(A, n)
    diagB = _op_diag(B, n) if B is not None else jnp.ones(n)
    tols = np.asarray(tols, dtype=float)
    # expected-cost model: Krylov iterations ~ log(1/tol_j) / dist_j with
    # dist_j = |Im z_j| (a spectrum-distance proxy for real-spectrum
    # pencils).  Inside ONE vmap the while_loop is lockstep (cost = max
    # over the batch), so points are bucketed by similar EXPECTED COST —
    # that is what converts per-point tolerances into saved matvecs.
    dist = np.maximum(np.abs(zc.imag), 1e-3 * np.maximum(np.abs(zc), 1.0))
    est = np.log(1.0 / np.clip(tols, 1e-16, 1e-1)) / dist
    order = np.argsort(est)
    Y = np.empty((npt, n, L), dtype=complex)
    info = {"buckets": [], "inner_iters": 0}
    for bkt in range(nbuckets):
        idx = order[bkt * npt // nbuckets: (bkt + 1) * npt // nbuckets]
        if idx.size == 0:
            continue
        tol_b = float(tols[idx].min())
        Yb, it = _bicgstab_block_counted(
            A, B, jnp.asarray(zc[idx]), Rc, diagA, diagB, tol_b, maxiter)
        Y[idx] = np.asarray(Yb)
        it_max = int(np.max(np.asarray(it)))
        info["buckets"].append({"points": int(idx.size), "tol": tol_b,
                                "iters": it_max})
        info["inner_iters"] += it_max * int(idx.size)
    return Y, info


def _op_diag(op, n: int):
    """Best-effort operator diagonal (for Jacobi preconditioning)."""
    from ..mat.linop import AIJOperator, DenseOperator, DIAOperator

    try:
        if isinstance(op, DIAOperator):
            if 0 in op.offsets:
                return op.diags[op.offsets.index(0)]
            return jnp.zeros(n, dtype=op.dtype)
        if isinstance(op, DenseOperator):
            return jnp.diagonal(op.A)
        if isinstance(op, AIJOperator):
            eqs = op.indices == jax.lax.broadcasted_iota(
                jnp.int32, op.indices.shape, 0)
            return jnp.sum(jnp.where(eqs, op.data, 0), axis=1)
    except Exception:
        pass
    return jnp.zeros(n)


def slice_submeshes(npart: int):
    """Disjoint contiguous row sub-meshes for slicing partitions.

    The reference replicates the matrices into npart subcommunicators and
    runs one subinterval per subcomm (ks-slice.c:341-416,
    EPSKrylovSchurSetPartitions).  Single-controller analog: split the
    visible devices into npart contiguous groups, each a 1-D 'rows' Mesh;
    every partition's device work (Krylov vector ops, iterative solves)
    dispatches onto its own group and overlaps with the others.  Returns
    None when fewer than 2 devices are visible (nothing to split).
    """
    devs = jax.devices()
    if npart <= 1 or len(devs) < 2:
        return None
    from ..sys.mesh import ROWS

    per = max(1, len(devs) // npart)
    ngroups = min(npart, len(devs) // per)
    return [Mesh(np.asarray(devs[i * per:(i + 1) * per]), (ROWS,))
            for i in range(ngroups)]


def thread_map_submesh(fn, items: Sequence, meshes=None,
                       max_workers: Optional[int] = None):
    """thread_map with each task pinned to a sub-mesh's lead device, so
    concurrent partitions dispatch device work onto disjoint device
    groups (the subcommunicator pattern).  meshes=None degrades to plain
    thread_map."""
    if not meshes:
        return thread_map(fn, items, max_workers)

    def run(ix_item):
        ix, item = ix_item
        dev = meshes[ix % len(meshes)].devices.flat[0]
        with jax.default_device(dev):
            return fn(item)

    return thread_map(run, list(enumerate(items)), max_workers)


def thread_map(fn, items: Sequence, max_workers: Optional[int] = None):
    """Run fn over items on a thread pool, preserving order — the host
    tier of subcommunicator task parallelism (factorizations release the
    GIL).  Used for spectrum-slicing partitions and per-point
    factorizations when the operators are not device-jittable."""
    from concurrent.futures import ThreadPoolExecutor

    if len(items) <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=max_workers or min(8, len(items))) \
            as ex:
        return list(ex.map(fn, items))
