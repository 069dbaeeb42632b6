"""EPS RQCG — Rayleigh quotient minimization by conjugate gradients.

Reference: src/eps/impls/cg/rqcg/rqcg.c (390 LoC): nonlinear CG on the
Rayleigh quotient rho(x) = x^H A x / x^H B x for the smallest eigenvalues,
with periodic Rayleigh-Ritz resets and locking.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..bv.orthog import cholqr2
from .base import EPS, EPSSolver


class RQCG(EPSSolver):
    reset_every = 20  # reference -eps_rqcg_reset default

    def solve(self, eps: EPS) -> None:
        if not eps.is_hermitian:
            raise ValueError("rqcg requires a Hermitian problem type")
        if eps.which.value.startswith("largest"):
            raise ValueError("rqcg computes smallest eigenvalues")
        A, B = eps.A, eps.B
        n = eps.n
        dtype = np.dtype(eps.A.dtype)
        rng = np.random.default_rng(0)

        locked: list[np.ndarray] = []
        lams: list[float] = []
        errs: list[float] = []
        eps.its = 0

        for pair in range(eps.nev):
            x = rng.standard_normal(n)
            if eps.initial_space is not None and pair < eps.initial_space.shape[1]:
                x = np.asarray(eps.initial_space[:, pair])
            xj = jnp.asarray(x, dtype=dtype)
            xj = _deflate(xj, locked)
            Bx = B.mult(xj) if B is not None else xj
            xj = xj / jnp.sqrt(jnp.real(jnp.vdot(xj, Bx)))
            p = None
            g_prev = None
            rho = 0.0
            err = np.inf
            it_reset = 0
            while eps.its < eps.max_it:
                eps.its += 1
                it_reset += 1
                Ax = A.mult(xj)
                Bx = B.mult(xj) if B is not None else xj
                rho = float(jnp.real(jnp.vdot(xj, Ax)) / jnp.real(jnp.vdot(xj, Bx)))
                g = Ax - rho * Bx  # gradient direction (residual)
                g = _deflate(g, locked)
                rn = float(jnp.linalg.norm(g))
                err = eps.conv_measure(rho, rn)
                if err < eps.tol:
                    break
                if p is None or it_reset % self.reset_every == 0:
                    p = -g
                else:
                    gg = float(jnp.real(jnp.vdot(g, g)))
                    beta = gg / max(g_prev, 1e-300)  # Fletcher-Reeves
                    p = -g + beta * p
                g_prev = float(jnp.real(jnp.vdot(g, g)))
                # exact line search: minimize rho(x + alpha p) — 2x2
                # Rayleigh-Ritz on span{x, p}
                Sb = jnp.stack([xj, p / jnp.linalg.norm(p)], axis=1)
                Sb, _ = cholqr2(Sb, (lambda v: B.mult(v)) if B is not None else None)
                ASb = A.mult(Sb)
                G = np.asarray(Sb.conj().T @ ASb)
                w, C = np.linalg.eigh(0.5 * (G + G.conj().T))
                xj = Sb @ jnp.asarray(C[:, 0], dtype=dtype)
                Bx = B.mult(xj) if B is not None else xj
                xj = xj / jnp.sqrt(jnp.real(jnp.vdot(xj, Bx)))
            locked.append(np.asarray(xj))
            lams.append(rho)
            errs.append(err)
            eps.monitor(eps, eps.its, len([e for e in errs if e < eps.tol]),
                        np.array(lams), np.array(errs))
            if err >= eps.tol:
                break

        k = sum(1 for e in errs if e < eps.tol)
        eps.nconv = k
        eps.eigenvalues = np.array(lams)
        eps.errests = np.array(errs)
        eps._eigenvectors = (np.stack(locked, axis=1) if locked
                             else np.zeros((n, 0), dtype=dtype))


def _deflate(v, X):
    for x in X:
        xj = jnp.asarray(x)
        v = v - xj * jnp.vdot(xj, v)
    return v


EPS.register("rqcg", RQCG)
