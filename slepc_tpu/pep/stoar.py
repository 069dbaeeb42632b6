"""PEP STOAR — symmetric TOAR for quadratic eigenproblems.

Reference: src/pep/impls/krylov/stoar/stoar.c (1,092 LoC): for symmetric
QEPs (hyperbolic/gyroscopic; K, C, M symmetric) run a pseudo-Lanczos
recurrence that preserves the symmetric-indefinite structure of the
linearization, halving memory/work vs general TOAR.

Design here: the symmetric linearization pencil
    A_L = [[-K, 0], [0, M]],   B_L = [[C, M], [M, 0]]
is symmetric / symmetric-indefinite; the pencil eigenproblem
A_L z = lambda B_L z reproduces the QEP with z = [x; lambda x].  The
solve runs through the EPS GHIEP machinery (pseudo-Lanczos with an
indefinite B_L inner product, omega signature tracking) — the
structure-preserving property STOAR exists for.
"""

from __future__ import annotations

import numpy as np


def stoar_solve(pep) -> None:
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ..eps.base import EPS, ProblemType
    from ..mat.linop import AIJOperator, DenseOperator, ShellOperator
    from ..st.st import STSinvert
    from ..sys.sort import Which

    if pep.degree != 2:
        from .toar import toar_solve

        toar_solve(pep)
        return
    K, C, M = pep.mats
    n = pep.n
    dtype = np.dtype(K.dtype)

    def mvA(z):
        return jnp.concatenate([-K.mult(z[:n]), M.mult(z[n:])], axis=0)

    def mvB(z):
        return jnp.concatenate([C.mult(z[:n]) + M.mult(z[n:]),
                                M.mult(z[:n])], axis=0)

    AL = ShellOperator((2 * n, 2 * n), dtype, mvA, mvA,
                       nnz=K.nnz + M.nnz)
    BL = ShellOperator((2 * n, 2 * n), dtype, mvB, mvB,
                       nnz=C.nnz + 2 * M.nnz)

    target = complex(pep.target) if pep.target is not None else 0.0
    if target.imag == 0:
        target = target.real
    eps = EPS(AL, BL, problem_type=ProblemType.GHIEP,
              nev=pep.nev, ncv=pep.ncv and 2 * pep.ncv,
              tol=pep.tol, max_it=pep.max_it)
    eps.set_target(target)

    # sinvert on the assembled symmetric pencil (A_L - sigma B_L is
    # symmetric: the native LDL^T / LU factorization path applies)
    def assemble(op):
        s = op.to_scipy()
        return s if sp.issparse(s) else sp.csr_matrix(s)

    Ks, Cs, Ms = (assemble(x) for x in (K, C, M))
    ALs = sp.bmat([[-Ks, None], [None, Ms]], format="csr")
    BLs = sp.bmat([[Cs, Ms], [Ms, None]], format="csr")

    class _PencilSinvert(STSinvert):
        def _shifted_scipy(self, sigma):
            return (ALs - sigma * BLs).tocsr()

    eps.set_st(_PencilSinvert([AL, BL], sigma=target, hermitian=False))
    try:
        eps.solve()
    except AssertionError:
        # complex pairs in the pseudo-Lanczos projected problem: the
        # symmetric specialization targets hyperbolic/overdamped QEPs
        # (real eigenvalues); fall back to general TOAR otherwise
        from .toar import toar_solve

        toar_solve(pep)
        return

    pep.its = eps.its
    k = eps.nconv
    pep.nconv = k
    lam = eps.eigenvalues[:k]
    Z = eps._eigenvectors[:, :k] if k else np.zeros((2 * n, 0))
    X = Z[:n, :]
    nrm = np.linalg.norm(X, axis=0)
    nrm[nrm == 0] = 1
    pep.eigenvalues = lam.copy()
    pep.errests = eps.errests[:k].copy() if len(eps.errests) >= k else np.zeros(k)
    pep._eigenvectors = X / nrm
