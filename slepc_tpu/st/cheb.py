"""Chebyshev spectral acceleration — the low-end amplifier operator.

Role in the reference: STFILTER wraps the operator in a polynomial filter so
that Krylov iteration converges eigenvalues inside an interval without
factorizations (src/sys/classes/st/impls/filter/filter.c:18-40 operator
table; the reference embeds FILTLAN).  ``st/filter.py`` already provides the
interval-indicator (damped) filter for spectrum slicing.  This module is the
complementary MONOTONE filter for ``which="smallest"`` on Hermitian
operators whose low end is badly separated (relative gaps ~1e-5 on a 10M-row
Laplacian make plain thick-restart Lanczos take tens of thousands of
columns):

    B = p(A),   p(lam) = T_d( (hi + lo - 2 lam) / (hi - lo) )

maps the unwanted bulk [lo, hi] into [-1, 1] and GROWS like
cosh(d * acosh(t(lam))) for lam < lo — smallest eigenvalues of A become the
largest of B with exponentially amplified relative gaps, and the smallest-
first order is preserved (p is monotone decreasing on (-inf, lo]).  Unlike
shift-and-invert there is no inner solve and no inexactness: p(A) is an
exact polynomial, so the jitted Krylov-Schur cycle's residual machinery
applies verbatim, and every eigenvector of A is an eigenvector of every
p(A) — the filter window can be ADAPTED between restarts while keeping
converged rows locked.

TPU shape: one filtered apply = ``degree`` SpMVs chained in a
``lax.fori_loop`` (three-term Chebyshev recurrence), fully fused into the
Krylov cycle's XLA program.  (lo, hi) are TRACED pytree leaves, so window
adaptation does not recompile; ``degree`` is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class ChebAmplifyOperator:
    """B = T_degree((hi + lo - 2 A)/(hi - lo)) over any mult/mult2d operator.

    Wraps a base operator (flat or padded-2-D layout, any dtype) and
    exposes the same apply surface, so the jitted KS cycle runs on B
    unchanged.  lo/hi are traced leaves; degree is static.
    """

    def __init__(self, base, lo, hi, degree: int):
        self.base = base
        rdt = jnp.zeros((), base.dtype).real.dtype
        self.lo = jnp.asarray(lo, rdt)
        self.hi = jnp.asarray(hi, rdt)
        self.degree = int(degree)

    # ---- mirrored operator surface -------------------------------------
    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def nnz(self):
        # flop-accounting view: one filtered apply streams the operator
        # `degree` times
        return int(getattr(self.base, "nnz", 0)) * max(self.degree, 1)

    @property
    def n_interior(self):
        return getattr(self.base, "n_interior", self.base.shape[0])

    @property
    def mask2d(self):
        return self.base.mask2d

    @property
    def mask(self):
        return getattr(self.base, "mask", None)

    def pad(self, x):
        return self.base.pad(x)

    def pad2d(self, x):
        return self.base.pad2d(x)

    def unpad(self, xp):
        return self.base.unpad(xp)

    # ---- the filtered apply --------------------------------------------
    def _apply(self, x, basemult):
        d = self.degree
        if d <= 0:
            return x
        dt = x.dtype
        a = (2.0 / (self.hi - self.lo)).astype(dt)
        b = ((self.hi + self.lo) / (self.hi - self.lo)).astype(dt)

        def L(v):  # affine map: t(A) v
            return b * v - a * basemult(v)

        t1 = L(x)
        if d == 1:
            return t1

        def body(_, carry):
            tm1, tk = carry
            return tk, 2.0 * L(tk) - tm1

        _, td = jax.lax.fori_loop(1, d, body, (x, t1))
        return td

    def mult2d(self, xp):
        return self._apply(xp, self.base.mult2d)

    def mult(self, x):
        return self._apply(x, self.base.mult)

    def mult2d_block(self, Xb):
        """Filtered apply on a (b, rows, W) block: the three-term
        recurrence carries whole blocks, and the base block-SpMV kernel
        (when present) reads the diagonals once per b columns."""
        base_blk = getattr(self.base, "mult2d_block", None)
        if base_blk is None:
            base_blk = jax.vmap(self.base.mult2d)
        return self._apply(Xb, base_blk)

    mult_h = mult  # Hermitian by construction

    # ---- pytree ---------------------------------------------------------
    def tree_flatten(self):
        return (self.base, self.lo, self.hi), (self.degree,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.base, obj.lo, obj.hi = children
        (obj.degree,) = aux
        return obj


def cheb_value(lam, lo, hi, degree: int):
    """Host evaluation of p(lam) = T_d(t(lam)) (stable cosh/cos form).

    Used to rebuild locked diagonal entries when the filter window moves:
    locked rows hold eigenvectors of A, whose filtered eigenvalue under the
    NEW window is exactly p_new(lam).
    """
    lam = np.asarray(lam, np.float64)
    t = (hi + lo - 2.0 * lam) / (hi - lo)
    out = np.empty_like(t)
    inside = np.abs(t) <= 1.0
    out[inside] = np.cos(degree * np.arccos(t[inside]))
    big = t > 1.0
    # clamp the argument: f64 cosh overflows at ~710
    arg = degree * np.arccosh(np.maximum(t[big], 1.0))
    out[big] = np.cosh(np.minimum(arg, 700.0))
    neg = t < -1.0
    argn = degree * np.arccosh(np.maximum(-t[neg], 1.0))
    out[neg] = ((-1.0) ** degree) * np.cosh(np.minimum(argn, 700.0))
    return out


def gershgorin_upper(op) -> float:
    """Upper bound on lambda_max from row sums of |a_ij| (safe ``hi``).

    Understands the DIA family (host DIAOperator and the padded /
    double-single Pallas operators); anything else falls back to a short
    power iteration with a 10% safety margin (NOT a guaranteed bound — DIA
    callers get the rigorous one).
    """
    from ..mat.linop import DIAOperator

    if isinstance(op, DIAOperator):
        return float(np.max(np.sum(np.abs(np.asarray(op.diags)), axis=0)))
    dph = getattr(op, "dph", None)
    if dph is not None:  # DIAPaddedOperatorDS: values are hi+lo pairs
        # f32 arithmetic on purpose: |hi|+|lo| >= |hi+lo| keeps it an
        # upper bound, and the f64 variant of this tiny reduce costs a
        # multi-minute remote compile on TPU
        s = jnp.sum(jnp.abs(dph) + jnp.abs(op.dpl), axis=0)
        return float(jnp.max(s)) * (1.0 + 1e-5)
    dp = getattr(op, "dp", None)
    if dp is not None:  # DIAPaddedOperator
        return float(jnp.max(jnp.sum(jnp.abs(dp), axis=0)))
    # generic: power iteration upper estimate
    key = jax.random.PRNGKey(7)
    mult2d = getattr(op, "mult2d", None)
    if mult2d is not None and hasattr(op, "mask2d"):
        v = jax.random.normal(key, op.mask2d.shape,
                              jnp.zeros((), op.dtype).real.dtype)
        v = (v * op.mask2d).astype(op.dtype)
        mult = mult2d
    else:
        v = jax.random.normal(key, (op.shape[0],),
                              jnp.zeros((), op.dtype).real.dtype)
        v = v.astype(op.dtype)
        mult = op.mult

    @jax.jit
    def power(opx, v):
        mx = opx.mult2d if hasattr(opx, "mult2d") and v.ndim == 2 else opx.mult

        def body(_, v):
            w = mx(v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, 30, body, v)
        return jnp.linalg.norm(mx(v))

    return float(power(op, v)) * 1.1
