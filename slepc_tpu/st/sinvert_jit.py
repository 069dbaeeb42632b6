"""Device-side shift-and-invert: jitted iterative inner solves on TPU.

Reference: STSINVERT's inner solve is a PETSc KSP — normally a distributed
DIRECT factorization (MUMPS via -st_pc_factor_mat_solver_type,
src/sys/classes/st/interface/stsles.c:35-59).  The host-serial LDL^T tier
(native/ldl.cpp, ksp/direct.py) covers moderate sizes, but at flagship
scale the relay's ~MB/s uploads make any host factorization unusable.
This module is the TPU-native tier: the transformed operator

    M = D^{1/2} (A - sigma B)^{-1} D^{1/2}      (B = diag(d) SPD)
    M = (A - sigma I)^{-1}                      (standard)

applies a FIXED-ITERATION CG (definite) or MINRES (indefinite) inner solve
with the DIA Pallas SpMV — the entire shift-invert Krylov-Schur restart
cycle (extension + inner solves + projected eig + rotation) fuses into ONE
XLA program.  The diagonal-B symmetrization keeps the identity metric, so
the fully-jitted HEP fast path (eps/ks_jit.py) runs unchanged; eigenvalues
back-transform as lambda = sigma + 1/theta and eigenvectors as
x = D^{-1/2} u.

General (non-diagonal SPD) B still routes through the host-orchestrated
GHEP loop with a B-metric basis; this tier is the performance path for the
mass-lumped / standard cases the benchmarks exercise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class

from ..ksp.iterative_jit import cg_fixed, minres_fixed
from .st import ST


@register_pytree_node_class
class SinvertCGOperator:
    """Self-adjoint shift-invert operator on the padded Pallas layout.

    children: (Sop, dhalf, invdiag) — Sop a padded DIA operator for
    A - sigma B; dhalf the padded D^{1/2} array (None for standard
    problems); invdiag an optional Jacobi preconditioner array.
    aux: (iters, method).
    """

    def __init__(self, Sop, dhalf=None, invdiag=None, iters: int = 200,
                 method: str = "cg"):
        self.Sop = Sop
        self.dhalf = dhalf
        self.invdiag = invdiag
        self.iters = int(iters)
        self.method = method
        self.shape = Sop.shape
        self.dtype = Sop.dtype

    # ---- construction ---------------------------------------------------
    @classmethod
    def from_dia(cls, A, sigma=0.0, b_diag=None, iters: int = 200,
                 method: str = "cg", block_rows: int = 128):
        """Build from a DIAOperator A (host or device diagonals) and an
        optional diagonal SPD metric b_diag (device (n,) welcome)."""
        import jax

        from ..mat.linop import DIAOperator
        from ..ops.dia_pallas import (DIAPaddedOperator, DIAPaddedOperatorDS)

        offsets = list(A.offsets)
        f64 = np.dtype(A.dtype) == np.dtype(np.float64)
        dt = jnp.float64 if f64 else jnp.float32
        diags = jnp.asarray(A.diags, dt)
        if 0 not in offsets:
            offsets.append(0)
            diags = jnp.concatenate(
                [diags, jnp.zeros((1, diags.shape[1]), dt)], axis=0)
        i0 = offsets.index(0)
        if sigma != 0.0:
            shift = sigma * (jnp.asarray(b_diag, dt)
                             if b_diag is not None else 1.0)
            diags = diags.at[i0].add(-shift)
        order = np.argsort(offsets)
        S = DIAOperator(tuple(int(offsets[i]) for i in order), diags[order])
        use_ds = f64 and jax.default_backend() == "tpu"
        pad_cls = DIAPaddedOperatorDS if use_ds else DIAPaddedOperator
        Sop = pad_cls.from_dia(S, block_rows=block_rows)
        dhalf = None
        if b_diag is not None:
            dhalf = Sop.pad2d(jnp.sqrt(jnp.asarray(b_diag, dt)))
        pos0 = int(np.where(order == i0)[0][0])
        d0 = diags[order][pos0]
        invd = jnp.where(jnp.abs(d0) > 0, 1.0 / jnp.where(d0 != 0, d0, 1.0),
                         0.0)
        # Jacobi preconditioning only helps variable-diagonal systems;
        # keep it off for (near-)constant diagonals (free to re-enable)
        spread = float(jnp.max(jnp.abs(d0)) /
                       jnp.maximum(jnp.min(jnp.abs(d0) +
                                           (jnp.abs(d0) <= 0) * 1e30), 1e-30))
        invdiag = Sop.pad2d(invd) if (method == "cg" and spread > 4.0) \
            else None
        return cls(Sop, dhalf, invdiag, iters=iters, method=method)

    # ---- mirrored padded-operator surface -------------------------------
    @property
    def nnz(self):
        return int(getattr(self.Sop, "nnz", 0)) * max(self.iters, 1)

    @property
    def n_interior(self):
        return self.Sop.n_interior

    @property
    def n_pad(self):
        return self.Sop.n_pad

    @property
    def mask2d(self):
        return self.Sop.mask2d

    def pad(self, x):
        return self.Sop.pad(x)

    def pad2d(self, x):
        return self.Sop.pad2d(x)

    def unpad(self, xp):
        return self.Sop.unpad(xp)

    def postprocess_vec(self, xp):
        """Transformed-space eigenvector u -> original x = D^{-1/2} u."""
        if self.dhalf is None:
            return xp
        return jnp.where(self.dhalf > 0, xp / jnp.where(self.dhalf != 0,
                                                        self.dhalf, 1.0), 0.0)

    # ---- apply ----------------------------------------------------------
    def _solve(self, b):
        Minv = None
        if self.invdiag is not None:
            invd = self.invdiag

            def Minv(r):
                return r * invd

        if self.method == "minres":
            return minres_fixed(self.Sop.mult2d, b, self.iters)
        return cg_fixed(self.Sop.mult2d, b, self.iters, Minv=Minv)

    def mult2d(self, xp):
        y = xp * self.dhalf if self.dhalf is not None else xp
        z = self._solve(y)
        return z * self.dhalf if self.dhalf is not None else z

    def mult(self, x):
        from ..ops.dia_pallas import W

        return self.mult2d(x.reshape(-1, W)).reshape(-1)

    mult_h = mult  # self-adjoint by construction

    # ---- pytree ---------------------------------------------------------
    def tree_flatten(self):
        return (self.Sop, self.dhalf, self.invdiag), (self.iters, self.method)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.Sop, obj.dhalf, obj.invdiag = children
        obj.iters, obj.method = aux
        obj.shape = obj.Sop.shape
        obj.dtype = obj.Sop.dtype
        return obj


class STSinvertDevice(ST):
    """ST wrapper for the device iterative shift-invert tier.

    matrices = [A] or [A, B] with B a DIAGONAL DIAOperator (offsets (0,));
    lambda = sigma + 1/theta.  Routes through the fully-jitted HEP fast
    path (the symmetrization keeps the identity metric).
    """

    name = "sinvert-device"

    def __init__(self, matrices, sigma: complex = 0.0, iters: int = 200,
                 method: str = "cg"):
        super().__init__(matrices, sigma)
        self.iters = int(iters)
        self.method = method
        if self.B is not None and tuple(self.B.offsets) != (0,):
            raise ValueError(
                "STSinvertDevice needs a diagonal B (offsets (0,)); "
                "general SPD B routes through the host GHEP loop")

    def _compute_operator(self):
        b_diag = None
        if self.B is not None:
            b_diag = jnp.asarray(self.B.diags[0])
        return SinvertCGOperator.from_dia(
            self.A, sigma=float(np.real(self.sigma)), b_diag=b_diag,
            iters=self.iters, method=self.method)

    def back_transform(self, eigs):
        return self.sigma + 1.0 / eigs

    def eig_map(self, lam):
        return 1.0 / (lam - self.sigma)
