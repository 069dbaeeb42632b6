"""Split-complex (two-real-planes) operators — the complex TPU tier.

The axon TPU PJRT rejects complex dtypes outright ("Element type C128 is
not supported on TPU"), so every genuinely complex problem used to run on
the CPU backend.  This module represents complex vectors as a stacked
pair of REAL planes  x = [Re x; Im x]  with shape (2,) + vshape and a
complex operator A = Ar + i*Ai as two real operators, so the whole
Krylov fast path (Pallas DIA SpMV, fused CGS2, rotations) runs on TPU in
real arithmetic:

    y = A x:   Re y = Ar Re x - Ai Im x
               Im y = Ar Im x + Ai Re x        (4 real SpMVs)

Reference role: the complex-scalar build of the reference library
(PetscScalar complex, include/slepcmath.h) — here a per-operator tier
instead of a build-time flag, so real problems keep paying nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class SplitComplexDIAOperator:
    """Complex DIA operator as two real-plane operators.

    ``opr``/``opi`` are real operators (DIAOperator, DIAPaddedOperator,
    DIAPaddedOperatorDS, ...) sharing layout; vectors are (2,) + vshape
    stacked [re, im] planes.  Exposes the transposed-basis Krylov apply
    surface (mult2d on planes, mask2d, pad2d/unpad with complex host
    endpoints).
    """

    def __init__(self, opr, opi):
        self.opr = opr
        self.opi = opi

    # ---- construction ---------------------------------------------------
    @classmethod
    def from_complex_dia(cls, offsets, diags):
        """Build from complex (ndiag, n) diagonals; each real plane routes
        through the standard fast-path preparation (Pallas when
        supported)."""
        from ..mat.linop import DIAOperator

        diags = np.asarray(diags)
        rdt = np.float64 if diags.dtype == np.complex128 else np.float32
        Ar = DIAOperator(offsets, diags.real.astype(rdt))
        Ai = DIAOperator(offsets, diags.imag.astype(rdt))
        if Ar.dp is not None and Ai.dp is not None:
            from .dia_pallas import DIAPaddedOperator

            return cls(DIAPaddedOperator.from_dia(Ar),
                       DIAPaddedOperator.from_dia(Ai))
        return cls(Ar, Ai)

    # ---- mirrored surface ----------------------------------------------
    @property
    def shape(self):
        return self.opr.shape

    @property
    def dtype(self):  # real plane dtype
        return self.opr.dtype

    @property
    def n_interior(self):
        return getattr(self.opr, "n_interior", self.opr.shape[0])

    @property
    def nnz(self):
        return int(getattr(self.opr, "nnz", 0)) \
            + int(getattr(self.opi, "nnz", 0))

    @property
    def padded(self) -> bool:
        return hasattr(self.opr, "mask2d")

    @property
    def mask_planes(self):
        """(2,) + vshape interior mask (1 on interior rows, 0 on halo)."""
        if self.padded:
            m = self.opr.mask2d
        else:
            m = jnp.ones((self.opr.shape[0],), self.dtype)
        return jnp.stack([m, m])

    def _basemult(self, op, x):
        m2 = getattr(op, "mult2d", None)
        if m2 is not None and x.ndim == 2:
            return m2(x)
        return op.mult(x)

    def mult_split(self, x2):
        """y = (Ar + i Ai) x on stacked planes x2 = (2,) + vshape."""
        xr, xi = x2[0], x2[1]
        yr = self._basemult(self.opr, xr) - self._basemult(self.opi, xi)
        yi = self._basemult(self.opr, xi) + self._basemult(self.opi, xr)
        return jnp.stack([yr, yi])

    # ---- host endpoints -------------------------------------------------
    def pad_split(self, x):
        """Complex host vector -> (2,) + vshape device planes."""
        x = np.asarray(x)
        if self.padded:
            return jnp.stack([self.opr.pad2d(jnp.asarray(
                np.ascontiguousarray(x.real))),
                self.opr.pad2d(jnp.asarray(
                    np.ascontiguousarray(x.imag)))])
        return jnp.stack([jnp.asarray(x.real, self.dtype),
                          jnp.asarray(x.imag, self.dtype)])

    def unpad_split(self, x2):
        """(2,) + vshape planes -> complex host vector."""
        if self.padded:
            re = np.asarray(self.opr.unpad(x2[0]))
            im = np.asarray(self.opr.unpad(x2[1]))
        else:
            re, im = np.asarray(x2[0]), np.asarray(x2[1])
        return re + 1j * im

    # ---- pytree ---------------------------------------------------------
    def tree_flatten(self):
        return (self.opr, self.opi), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.opr, obj.opi = children
        return obj
