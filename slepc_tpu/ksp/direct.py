"""Direct factorization backends + inertia computation.

The reference's ST sinvert / spectrum slicing rely on per-rank CPU direct
factorizations (PETSc PCLU/PCCHOLESKY, optionally MUMPS/SuperLU) and read
the matrix inertia off the factors (reference: ks-slice.c:227-258
EPSSliceGetInertia -> MatGetInertia).  TPU design decision (SURVEY §7 hard
parts): a distributed sparse direct factorization has no good XLA analog,
so we provide
  * device dense LU (jax.scipy lu_factor/lu_solve) for small/projected
    operators,
  * host sparse LU (scipy splu) bridged with ``jax.pure_callback`` so a
    factorized solve can sit inside a jitted operator apply — the same
    role as the reference's CPU factorization packages,
  * host banded/tridiagonal LDL^T with inertia (Sturm counts) for the
    slicing path,
while the genuinely TPU-native inner-solve route is iterative (ksp.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mat.linop import AIJOperator, DenseOperator, DIAOperator, LinearOperator


class DirectSolver:
    """Factorize once, solve many times; jit-safe ``solve``."""

    def __init__(self, A: LinearOperator, backend: str = "auto"):
        self.A = A
        self.n = A.shape[0]
        self.dtype = np.dtype(A.dtype)
        if backend == "auto":
            if isinstance(A, DenseOperator):
                backend = "dense"
            elif self._is_tridiag_device():
                # symmetric tridiagonal DIA: whole factor/solve/inertia
                # pipeline stays ON DEVICE (associative-scan LDL^T,
                # ksp/tridiag_device.py) — no host transfer, no serial
                # Python Sturm loop; the tier that lets spectrum slicing
                # run its shift certificates at multi-million rows
                backend = "tridiag_device"
            elif self._is_btridiag_device():
                # symmetric BANDED DIA (2-D Laplacian class): block-
                # tridiagonal LDL^T scan on device with per-block
                # inertia (ksp/tridiag_device.py btridiag_*)
                backend = "btridiag_device"
            elif isinstance(A, (DIAOperator, AIJOperator)):
                backend = "ldl" if self._is_symmetric_real() else "splu"
            else:
                backend = "dense" if self.n <= 4096 else "splu"
        self.backend = backend
        self._factored = False

    def _is_tridiag_device(self) -> bool:
        if not isinstance(self.A, DIAOperator):
            return False
        if np.issubdtype(self.dtype, np.complexfloating):
            return False
        from .tridiag_device import tridiag_of_operator

        return tridiag_of_operator(self.A) is not None

    def _is_btridiag_device(self) -> bool:
        if not isinstance(self.A, DIAOperator):
            return False
        if np.issubdtype(self.dtype, np.complexfloating):
            return False
        try:
            from .tridiag_device import btridiag_of_operator

            self._btd_cache = btridiag_of_operator(self.A)
        except Exception:
            self._btd_cache = None
        return self._btd_cache is not None

    def _is_symmetric_real(self) -> bool:
        if np.issubdtype(self.dtype, np.complexfloating):
            return False
        try:
            import scipy.sparse as sp

            As = self.A.to_scipy()
            if not sp.issparse(As):
                return bool(np.allclose(As, As.T, atol=1e-14))
            d = As - As.T
            return d.nnz == 0 or float(abs(d).max()) < 1e-14
        except Exception:
            return False

    def _factor(self):
        self._factored = True
        if self.backend == "tridiag_device":
            from .tridiag_device import tridiag_of_operator

            a, b = tridiag_of_operator(self.A)
            self._td_a = jnp.asarray(a)
            self._td_b = jnp.asarray(b)
            return
        if self.backend == "btridiag_device":
            from .tridiag_device import btridiag_of_operator

            btd = getattr(self, "_btd_cache", None)
            if btd is None:
                btd = btridiag_of_operator(self.A)
            Ab, Bb = btd
            self._btd_A = jnp.asarray(Ab)
            self._btd_B = jnp.asarray(Bb)
            return
        if self.backend == "ldl":
            from ..native.ldl import LDLFactorization, ldl_available

            if ldl_available():
                self._ldl = LDLFactorization(self.A.to_scipy())
                neg, zero, pos = self._ldl.inertia()
                if zero == 0 and (neg == 0 or pos == 0):
                    return  # definite: unpivoted LDL^T solve is stable
                # indefinite (or singular leading minors): without 2x2
                # Bunch-Kaufman pivoting the LDL^T solve amplifies error;
                # keep the factor for INERTIA only (the slicing primitive)
                # and solve through LU — the reference splits the roles the
                # same way (Cholesky for definite, LU for general).
            self.backend = "splu"  # degrade the solve path
        if self.backend == "dense":
            Ad = self.A.to_dense() if not isinstance(self.A, DenseOperator) else self.A.A
            self._lu, self._piv = jax.scipy.linalg.lu_factor(Ad)
        elif self.backend == "splu":
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            As = self.A.to_scipy()
            if not sp.issparse(As):
                As = sp.csc_matrix(As)
            self._splu = spla.splu(sp.csc_matrix(As))
        else:
            raise ValueError(f"unknown direct backend {self.backend}")

    def solve(self, b):
        if not self._factored:
            self._factor()
        if self.backend == "tridiag_device":
            from .tridiag_device import tridiag_solve

            return tridiag_solve(self._td_a, self._td_b,
                                 jnp.zeros((), self._td_a.dtype),
                                 jnp.asarray(b, self._td_a.dtype))
        if self.backend == "btridiag_device":
            from .tridiag_device import btridiag_solve

            bf = jnp.asarray(b, self._btd_A.dtype).reshape(-1)
            return btridiag_solve(self._btd_A, self._btd_B,
                                  jnp.zeros((), self._btd_A.dtype), bf)
        if self.backend == "dense":
            return jax.scipy.linalg.lu_solve((self._lu, self._piv), b)
        if self.backend == "ldl":
            ldl = self._ldl

            def host_solve(b_host):
                return ldl.solve(np.asarray(b_host, dtype=np.float64)).astype(
                    np.asarray(b_host).dtype, copy=False)

            if not isinstance(b, jax.core.Tracer):
                # eager: no callback machinery (the TPU plugin may not
                # support host callbacks at all) — move, solve, move back
                return jnp.asarray(host_solve(np.asarray(b)))
            return jax.pure_callback(
                host_solve, jax.ShapeDtypeStruct(jnp.shape(b), jnp.asarray(b).dtype),
                b, vmap_method="sequential")
        # host splu; pure_callback only under tracing (jit-safe on CPU;
        # the axon TPU plugin lacks host callbacks, so solvers route
        # host-direct operators through the eager Arnoldi path)
        splu = self._splu

        def host_solve(b_host):
            b_np = np.asarray(b_host)
            # splu solves in the factorization dtype; cast carefully
            x = splu.solve(b_np.astype(splu.U.dtype, copy=False))
            if np.iscomplexobj(x) and not np.iscomplexobj(b_np):
                return x  # complex factor, real rhs: keep the complex result
            return x.astype(b_np.dtype, copy=False)

        if not isinstance(b, jax.core.Tracer):
            return jnp.asarray(host_solve(np.asarray(b)))
        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct(jnp.shape(b), jnp.asarray(b).dtype), b,
            vmap_method="sequential")

    def solve_h(self, b):
        """Solve A^H x = b (needed by two-sided methods)."""
        if not self._factored:
            self._factor()
        if self.backend in ("ldl", "tridiag_device", "btridiag_device"):
            return self.solve(b)  # symmetric factorization
        if self.backend == "dense":
            return jax.scipy.linalg.lu_solve((self._lu, self._piv), b, trans=2)
        splu = self._splu

        def host_solve(b_host):
            b_np = np.asarray(b_host)
            x = splu.solve(b_np.astype(splu.U.dtype, copy=False), trans="H")
            return x.astype(b_np.dtype, copy=False)

        if not isinstance(b, jax.core.Tracer):
            return jnp.asarray(host_solve(np.asarray(b)))
        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct(jnp.shape(b), jnp.asarray(b).dtype), b,
            vmap_method="sequential")

    def inertia(self) -> Tuple[int, int, int]:
        """(n_neg, n_zero, n_pos) for the symmetric operator."""
        if self.backend == "tridiag_device":
            if not self._factored:
                self._factor()
            from .tridiag_device import tridiag_inertia as _ti_dev

            neg = int(_ti_dev(self._td_a, self._td_b,
                              jnp.zeros((), self._td_a.dtype)))
            return neg, 0, self.n - neg
        if self.backend == "btridiag_device":
            if not self._factored:
                self._factor()
            from .tridiag_device import btridiag_inertia as _bti_dev

            neg = int(_bti_dev(self._btd_A, self._btd_B,
                               jnp.zeros((), self._btd_A.dtype)))
            return neg, 0, self.n - neg
        if isinstance(self.A, DIAOperator) and set(self.A.offsets) <= {-1, 0, 1}:
            d = np.asarray(self.A.diags[self.A.offsets.index(0)])
            if 1 in self.A.offsets:
                e = np.asarray(self.A.diags[self.A.offsets.index(1)])[:-1]
            else:
                e = np.zeros(self.n - 1)
            return tridiag_inertia(d, e)
        if self.backend == "ldl" and not self._factored:
            self._factor()
        if getattr(self, "_ldl", None) is not None:
            return self._ldl.inertia()
        As = self.A.to_scipy()
        import scipy.sparse as sp

        if sp.issparse(As):
            if self._is_symmetric_real():
                from ..native.ldl import LDLFactorization, ldl_available

                if ldl_available():
                    return LDLFactorization(As).inertia()
            bw = _bandwidth(As)
            if bw <= 64:
                return banded_ldlt_inertia(As, bw)
            As = As.toarray()
        w = np.linalg.eigvalsh(0.5 * (As + As.conj().T))
        tol = np.finfo(float).eps * max(1.0, np.abs(w).max()) * self.n
        return (int(np.sum(w < -tol)), int(np.sum(np.abs(w) <= tol)),
                int(np.sum(w > tol)))


def tridiag_inertia(d: np.ndarray, e: np.ndarray) -> Tuple[int, int, int]:
    """Inertia of a symmetric tridiagonal matrix by the LDL^T / Sturm
    recurrence: q_1 = d_1, q_i = d_i - e_{i-1}^2 / q_{i-1}."""
    n = len(d)
    neg = zero = pos = 0
    q = 0.0
    tiny = np.finfo(float).tiny
    for i in range(n):
        q = d[i] - (e[i - 1] ** 2 / q if i > 0 else 0.0)
        if q == 0.0:
            zero += 1
            q = tiny  # perturb past the singularity (reference perturbs the shift)
        elif q < 0:
            neg += 1
        else:
            pos += 1
    return neg, zero, pos


def banded_ldlt_inertia(A, bw: int) -> Tuple[int, int, int]:
    """Inertia of a symmetric banded matrix via unpivoted banded LDL^T.

    Adequate for the definite-shifted matrices slicing produces; a zero
    pivot is counted and perturbed (the reference detects this case and
    moves the shift, ks-slice.c:243-247).
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    n = A.shape[0]
    # band storage: band[j - i + bw? ] ... use dense band (bw+1, n) lower
    band = np.zeros((bw + 1, n))
    Ac = A.tocoo()
    for i, j, v in zip(Ac.row, Ac.col, Ac.data):
        if 0 <= i - j <= bw:
            band[i - j, j] = v
    neg = zero = pos = 0
    tiny = np.finfo(float).tiny
    for k in range(n):
        piv = band[0, k]
        if piv == 0.0:
            zero += 1
            piv = tiny
        elif piv < 0:
            neg += 1
        else:
            pos += 1
        lim = min(bw, n - 1 - k)
        if lim > 0:
            col = band[1 : lim + 1, k] / piv  # L[k+1..k+lim, k]
            for r in range(lim):
                # column j = k+1+r: A[j+s, j] -= L[j+s,k] * piv * L[j,k]
                band[: lim - r, k + 1 + r] -= col[r] * band[r + 1 : lim + 1, k]
            band[1 : lim + 1, k] = col  # store L
    return neg, zero, pos


def _bandwidth(A) -> int:
    import scipy.sparse as sp

    Ac = sp.coo_matrix(A)
    if Ac.nnz == 0:
        return 0
    return int(np.max(np.abs(Ac.row - Ac.col)))
