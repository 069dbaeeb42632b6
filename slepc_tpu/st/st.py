"""ST — spectral transformations.

Reference: src/sys/classes/st/ — the object holding the problem matrices
{A_i}, the shift sigma, and a KSP, presenting solvers with the transformed
operator (STComputeOperator, interface/stsolve.c:466; STApply = MatMult
then KSPSolve, stsolve.c:16-24) and undoing the transform on eigenvalues
(STBackTransform).

TPU design: the transformed operator is an operator-algebra composition
(Sum/Product/Shell of LinearOperators) whose ``mult`` is fully jittable —
linear solves inside it are either device iterative KSP or a factorized
direct solve bridged through a host callback (the reference's
factor-once-apply-many PCLU pattern, stsles.c:35-59).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..ksp import KSP
from ..mat.linop import (
    IdentityOperator,
    LinearOperator,
    ShellOperator,
    SumOperator,
)


class ST:
    """Base spectral transformation.

    Holds matrices [A] (standard) or [A, B] (generalized) — PEP passes
    d+1 coefficient matrices.  ``op()`` returns the transformed operator
    the Krylov loop multiplies by; ``back_transform`` maps transformed
    eigenvalues back (reference sinvert.c:16-39 etc.).
    """

    name = "shell"

    def __init__(self, matrices: Sequence[LinearOperator], sigma: complex = 0.0,
                 ksp_opts: Optional[dict] = None):
        self.mats: List[LinearOperator] = list(matrices)
        self.sigma = sigma
        self.ksp_opts = dict(ksp_opts or {})
        self._op: Optional[LinearOperator] = None
        self.ksp: Optional[KSP] = None

    # ---- shared helpers --------------------------------------------------
    @property
    def A(self) -> LinearOperator:
        return self.mats[0]

    @property
    def B(self) -> Optional[LinearOperator]:
        return self.mats[1] if len(self.mats) > 1 else None

    def set_shift(self, sigma: complex) -> None:
        if sigma != self.sigma:
            self.sigma = sigma
            self._op = None
            self.ksp = None

    def _shifted_operator(self, sigma) -> LinearOperator:
        """A - sigma*B (or A - sigma*I) as a composable operator."""
        if sigma == 0:
            return self.A
        B = self.B if self.B is not None else IdentityOperator(self.A.shape[0], self.A.dtype)
        return SumOperator((self.A, B), (1.0, -sigma))

    def _shifted_scipy(self, sigma):
        """Explicit host matrix of A - sigma*B for direct factorization
        (≙ ST_MATMODE_COPY; the operator-algebra path is MATMODE_SHELL)."""
        import scipy.sparse as sp

        As = self.A.to_scipy()
        if sigma == 0 and self.B is None:
            return As
        if self.B is None:
            n = self.A.shape[0]
            return As - sigma * sp.eye(n, dtype=As.dtype, format="csr") if sp.issparse(As) \
                else As - sigma * np.eye(n, dtype=As.dtype)
        Bs = self.B.to_scipy()
        return As - sigma * Bs

    def _make_ksp(self, sigma, hermitian=False) -> KSP:
        """KSP on (A - sigma*B).  Default: direct factorization (the
        reference's preonly+LU default, stsles.c:35-59); 'ksp_type' in
        ksp_opts selects an iterative method instead."""
        opts = dict(self.ksp_opts)
        method = opts.pop("ksp_type", "direct")
        op = self._shifted_operator(sigma)
        if method == "direct":
            from ..mat.linop import AIJOperator, DenseOperator

            # hand the KSP an operator that can reach the explicit matrix
            try:
                sc = self._shifted_scipy(sigma)
                import scipy.sparse as sp

                if sp.issparse(sc):
                    shifted = AIJOperator.from_scipy(sc)
                else:
                    shifted = DenseOperator(sc)
                return KSP(shifted, method="direct", hermitian=hermitian, **opts)
            except Exception:
                method = "cg" if hermitian else "bicgstab"
        return KSP(op, method=method, hermitian=hermitian, **opts)

    # ---- interface -------------------------------------------------------
    def op(self) -> LinearOperator:
        if self._op is None:
            self._op = self._compute_operator()
        return self._op

    def apply(self, x):
        return self.op().mult(x)

    def _compute_operator(self) -> LinearOperator:
        raise NotImplementedError

    def back_transform(self, eigs: np.ndarray) -> np.ndarray:
        return eigs

    def eig_map(self, lam: np.ndarray) -> np.ndarray:
        """Forward map original -> transformed spectrum (for sorting in the
        transformed space, ≙ SlepcSC routing through ST)."""
        return lam

    def get_bilinear(self) -> Optional[LinearOperator]:
        """Inner-product matrix for the solver's BV (B for GHEP)."""
        return None

    def check_null_space(self, vectors) -> int:
        """Test deflation-space vectors for membership in the nullspace of
        the ST coefficient matrix A - sigma*B; passing vectors are attached
        to the KSP as a nullspace so singular pencils solve cleanly
        (reference: STCheckNullSpace / STCheckNullSpace_Default,
        stsles.c:413-500 — consumed via EPSSetDeflationSpace).

        Returns the number of nullspace vectors found."""
        import jax.numpy as jnp

        V = jnp.asarray(vectors)
        if V.ndim == 1:
            V = V[:, None]
        S = self._shifted_operator(self.sigma)
        SV = S.mult(V)
        norms = np.asarray(jnp.linalg.norm(SV, axis=0))
        vnorms = np.asarray(jnp.linalg.norm(V, axis=0))
        eps_m = np.finfo(np.dtype(self.A.dtype)).eps
        tolzero = 10.0 * np.sqrt(eps_m)
        keep = norms < tolzero * np.maximum(vnorms, 1e-300)
        c = int(np.sum(keep))
        if c == 0:
            self.nullspace = None
            return 0
        N = np.asarray(V)[:, keep]
        # orthonormalize the nullspace basis
        Nq, _ = np.linalg.qr(N)
        self.nullspace = jnp.asarray(Nq)
        if self.ksp is None:
            self.op()  # builds the KSP for factorizing transforms
        if self.ksp is not None and hasattr(self.ksp, "set_nullspace"):
            self.ksp.set_nullspace(self.nullspace)
        return c


def _ksp_uses_host(ksp) -> bool:
    """True when the KSP's solve path runs on host (sparse LU / LDL^T) —
    Krylov loops must then stay host-orchestrated on callback-less TPUs."""
    if ksp.method != "direct":
        return False
    d = getattr(ksp, "_direct", None)
    return d is not None and d.backend != "dense"


class STShift(ST):
    """Op = A - sigma I (standard) / B^{-1}(A - sigma B) (generalized);
    lambda = theta + sigma.  Reference: impls/shift/shift.c."""

    name = "shift"

    def _compute_operator(self) -> LinearOperator:
        S = self._shifted_operator(self.sigma)
        if self.B is None:
            return S
        ksp = self._make_ksp_on_B()
        self.ksp = ksp
        n = self.A.shape[0]
        return ShellOperator(
            (n, n), self.A.dtype,
            lambda x: ksp.solve(S.mult(x)),
            lambda x: S.mult_h(ksp.solve_h(x) if hasattr(ksp, "solve_h") else ksp.solve(x)),
            nnz=self.A.nnz + (self.B.nnz if self.B else 0),
            host_callback=_ksp_uses_host(ksp))

    def _make_ksp_on_B(self) -> KSP:
        opts = dict(self.ksp_opts)
        method = opts.pop("ksp_type", "direct")
        return KSP(self.B, method=method, hermitian=True, **opts)

    def back_transform(self, eigs):
        return eigs + self.sigma

    def eig_map(self, lam):
        return lam - self.sigma


class STSinvert(ST):
    """Shift-and-invert: Op = (A - sigma B)^{-1} B (gen) or
    (A - sigma I)^{-1} (std); lambda = 1/theta + sigma.
    Reference: impls/sinvert/sinvert.c:16-77."""

    name = "sinvert"

    def __init__(self, matrices, sigma: complex = 0.0, ksp_opts=None,
                 hermitian: bool = False, ksp=None):
        super().__init__(matrices, sigma, ksp_opts)
        self.hermitian = hermitian
        # prebuilt KSP: spectrum slicing reuses ONE factorization per shift
        # for both inertia and the sinvert solves (ks-slice.c:227-258)
        self._ksp_prebuilt = ksp

    def _compute_operator(self) -> LinearOperator:
        ksp = self._ksp_prebuilt if self._ksp_prebuilt is not None else \
            self._make_ksp(self.sigma, hermitian=self.hermitian and self.B is None)
        self.ksp = ksp
        n = self.A.shape[0]
        B = self.B

        if B is None:
            mv = lambda x: ksp.solve(x)
            rmv = (lambda x: ksp._direct.solve_h(x)) if ksp.method == "direct" else None
        else:
            mv = lambda x: ksp.solve(B.mult(x))
            rmv = (lambda x: B.mult_h(ksp._direct.solve_h(x))) if ksp.method == "direct" else None
        return ShellOperator((n, n), self.A.dtype, mv, rmv,
                             nnz=self.A.nnz + (B.nnz if B else 0),
                             host_callback=_ksp_uses_host(ksp))

    def back_transform(self, eigs):
        return 1.0 / eigs + self.sigma

    def eig_map(self, lam):
        return 1.0 / (lam - self.sigma)


class STCayley(ST):
    """Op = (A - sigma B)^{-1} (A + nu B); lambda = (sigma*theta + nu)/(theta - 1).
    Reference: impls/cayley/cayley.c."""

    name = "cayley"

    def __init__(self, matrices, sigma: complex = 0.0, nu: Optional[complex] = None,
                 ksp_opts=None):
        super().__init__(matrices, sigma, ksp_opts)
        self.nu = nu if nu is not None else sigma

    def _compute_operator(self) -> LinearOperator:
        ksp = self._make_ksp(self.sigma)
        self.ksp = ksp
        n = self.A.shape[0]
        B = self.B if self.B is not None else IdentityOperator(n, self.A.dtype)
        M = SumOperator((self.A, B), (1.0, self.nu))
        return ShellOperator((n, n), self.A.dtype,
                             lambda x: ksp.solve(M.mult(x)),
                             nnz=2 * self.A.nnz,
                             host_callback=_ksp_uses_host(ksp))

    def back_transform(self, eigs):
        return (self.sigma * eigs + self.nu) / (eigs - 1.0)

    def eig_map(self, lam):
        return (lam + self.nu) / (lam - self.sigma)


class STPrecond(ST):
    """No transform; only supplies a preconditioner to GD/JD/LOBPCG
    (reference: impls/precond/precond.c)."""

    name = "precond"

    def _compute_operator(self) -> LinearOperator:
        return self.A

    def preconditioner(self, sigma: Optional[complex] = None):
        """Approximate inverse of (A - sigma B) as a closure."""
        from ..ksp.ksp import _jacobi_precond

        sig = self.sigma if sigma is None else sigma
        M = _jacobi_precond(self._shifted_operator(sig))
        return M if M is not None else (lambda x: x)


class STShell(ST):
    """User-defined transform (reference: impls/shell/shell.c)."""

    name = "shellst"

    def __init__(self, matrices, apply_fn, backtransform_fn=None, sigma=0.0,
                 apply_trans_fn=None):
        super().__init__(matrices, sigma)
        self._apply_fn = apply_fn
        self._bt = backtransform_fn
        self._apply_trans = apply_trans_fn

    def _compute_operator(self) -> LinearOperator:
        n = self.A.shape[0]
        return ShellOperator((n, n), self.A.dtype, self._apply_fn, self._apply_trans)

    def back_transform(self, eigs):
        return self._bt(eigs) if self._bt is not None else eigs
