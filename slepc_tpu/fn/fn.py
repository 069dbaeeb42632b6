"""FN — scalar and matrix functions.

Reference: src/sys/classes/fn/ — scalar f(x)/f'(x) plus dense matrix f(A)
and f(A)b with multiple selectable methods per type (exp Padé
scaling-and-squaring fnexp.c:33, Higham s&s :797; sqrt Denman–Beavers;
phi_k functions; rational p/q; combined functions).  Consumed by MFN
(f of the projected Hessenberg), NEP split form T(lambda)=sum A_i f_i(lambda),
and LME.

These act on the small projected matrices, so they are host numpy/scipy
with own implementations where scipy lacks the routine (phi_k via the
augmented-exponential block construction; Denman–Beavers sqrt as an
alternative method).  Scaling semantics follow FNSetScale: the evaluated
function is  alpha * f(beta * x).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import numpy as np
import scipy.linalg as sla


class _FNMeta(type):
    """``FN("exp", ...)`` dispatches to the registered type (slepc4py's
    ``FN().setType('exp')`` role); subclass construction is untouched."""

    def __call__(cls, *args, **kw):
        if cls is FN and args and isinstance(args[0], str):
            return fn_from_name(args[0], *args[1:], **kw)
        return super().__call__(*args, **kw)


class FN(metaclass=_FNMeta):
    """Base scalar/matrix function with FNSetScale semantics."""

    def __init__(self, alpha: complex = 1.0, beta: complex = 1.0):
        self.alpha = alpha
        self.beta = beta
        self.method = 0

    # subclasses implement the unscaled _f / _fprime / _fmat
    def _f(self, x):
        raise NotImplementedError

    def _fprime(self, x):
        raise NotImplementedError

    def _fmat(self, A):
        raise NotImplementedError

    def set_scale(self, alpha, beta=1.0):
        self.alpha, self.beta = alpha, beta

    def set_method(self, m: int):
        self.method = m

    def eval(self, x):
        """alpha * f(beta x) (reference FNEvaluateFunction)."""
        return self.alpha * self._f(self.beta * np.asarray(x))

    def eval_deriv(self, x):
        """alpha*beta*f'(beta x) (reference FNEvaluateDerivative)."""
        return self.alpha * self.beta * self._fprime(self.beta * np.asarray(x))

    def eval_mat(self, A) -> np.ndarray:
        """alpha * f(beta A) for dense A (reference FNEvaluateFunctionMat)."""
        A = np.asarray(A)
        return self.alpha * self._fmat(self.beta * A)

    def eval_mat_vec(self, A, b) -> np.ndarray:
        """f(A) b (reference FNEvaluateFunctionMatVec); A small dense."""
        return self.eval_mat(A) @ np.asarray(b)


class FNExp(FN):
    """exp(x).  Methods: 0 = scipy expm (Padé s&s), 1 = own Padé
    scaling-and-squaring (the reference's default algorithm, fnexp.c:33),
    2 = Hermitian eigendecomposition fast path."""

    def _f(self, x):
        return np.exp(x)

    _fprime = _f

    def _fmat(self, A):
        if self.method == 1:
            return _expm_pade(A)
        if self.method == 2:
            w, V = np.linalg.eigh(0.5 * (A + A.conj().T))
            return (V * np.exp(w)) @ V.conj().T
        return sla.expm(A)


class FNLog(FN):
    """log(x); matrix log via inverse scaling-and-squaring (scipy logm)."""

    def _f(self, x):
        return np.log(x.astype(complex) if np.any(np.real(x) <= 0) else x)

    def _fprime(self, x):
        return 1.0 / x

    def _fmat(self, A):
        F = sla.logm(np.asarray(A))
        return _realify(F, A)


class FNSqrt(FN):
    """sqrt(x).  Methods: 0 = scipy sqrtm (Schur), 1 = Denman–Beavers
    iteration (reference impls/sqrt method tables)."""

    def _f(self, x):
        return np.sqrt(x.astype(complex) if np.any(np.real(x) < 0) else x)

    def _fprime(self, x):
        return 0.5 / self._f(x)

    def _fmat(self, A):
        if self.method == 1:
            return _sqrtm_db(A)
        F = sla.sqrtm(np.asarray(A))
        return _realify(F, A)


class FNInvSqrt(FN):
    """x^{-1/2}; via DB iteration producing the inverse root directly."""

    def _f(self, x):
        return 1.0 / np.sqrt(x.astype(complex) if np.any(np.real(x) < 0) else x)

    def _fprime(self, x):
        return -0.5 * self._f(x) / x

    def _fmat(self, A):
        if self.method == 1:
            Y, Z = _sqrtm_db_pair(A)
            return Z  # Z -> A^{-1/2}
        F = np.linalg.inv(_realify(sla.sqrtm(np.asarray(A)), A))
        return F


class FNPhi(FN):
    """phi_k functions: phi_0=exp, phi_k(x) = (phi_{k-1}(x) - 1/(k-1)!)/x.

    Matrix phi_k via the augmented-exponential construction
    exp([[A, E],[0, J]]) (Sidje '98) — the reference's FNPHI
    (impls/phi/fnphi.c)."""

    def __init__(self, k: int = 1, alpha=1.0, beta=1.0):
        super().__init__(alpha, beta)
        self.k = int(k)

    def _f(self, x):
        x = np.asarray(x, dtype=complex)
        out = np.empty_like(x)
        flat = x.ravel()
        res = np.array([_phi_scalar(self.k, xi) for xi in flat])
        out = res.reshape(x.shape)
        if np.all(np.isreal(out)):
            out = out.real
        return out

    def _fprime(self, x):
        # phi_k' = phi_{k-1,shifted}: d/dx phi_k = (phi_{k-1} - k phi_k)/x
        x = np.asarray(x, dtype=complex)
        pk = self._f(x)
        pk1 = FNPhi(self.k - 1)._f(x) if self.k > 0 else np.exp(x)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.where(x != 0, (pk1 - self.k * pk) / x, 1.0 / math.factorial(self.k + 1))
        return d

    def _fmat(self, A):
        A = np.asarray(A)
        n = A.shape[0]
        k = self.k
        if k == 0:
            return sla.expm(A)
        # Block form: exp([[A, B],[0, J]])[0:n, n+k-1] = phi_k(A) b with
        # B = [b 0 ... 0] and J the k x k upper-shift; process identity
        # columns one at a time for the full matrix phi_k(A).
        F = np.zeros((n, n), dtype=complex)
        J = np.diag(np.ones(k - 1), 1) if k > 1 else np.zeros((1, 1))
        for j in range(n):
            W = np.zeros((n + k, n + k), dtype=complex)
            W[:n, :n] = A
            W[:n, n] = np.eye(n)[:, j]
            W[n:, n:] = J
            E = sla.expm(W)
            F[:, j] = E[:n, n + k - 1]
        return _realify(F, A)


def _phi_scalar(k: int, x: complex) -> complex:
    if abs(x) < 1e-4:
        # Taylor: phi_k(x) = sum_j x^j / (j+k)!
        s, t = 0.0 + 0j, 1.0
        for j in range(12):
            s += t / math.factorial(j + k)
            t *= x
        return s
    if k == 0:
        return np.exp(x)
    return (_phi_scalar(k - 1, x) - 1.0 / math.factorial(k - 1)) / x


class FNRational(FN):
    """p(x)/q(x) with coefficients high-to-low (reference FNRATIONAL,
    impls/rational/fnrational.c).  q omitted => polynomial."""

    def __init__(self, num: Sequence[float], den: Optional[Sequence[float]] = None,
                 alpha=1.0, beta=1.0):
        super().__init__(alpha, beta)
        self.num = np.asarray(num, dtype=float)
        self.den = None if den is None else np.asarray(den, dtype=float)

    def _f(self, x):
        p = np.polyval(self.num, x)
        if self.den is None:
            return p
        return p / np.polyval(self.den, x)

    def _fprime(self, x):
        dp = np.polyval(np.polyder(self.num), x)
        if self.den is None:
            return dp
        p = np.polyval(self.num, x)
        q = np.polyval(self.den, x)
        dq = np.polyval(np.polyder(self.den), x)
        return (dp * q - p * dq) / q**2

    def _fmat(self, A):
        A = np.asarray(A)
        n = A.shape[0]
        P = _polyvalm(self.num, A)
        if self.den is None:
            return P
        Q = _polyvalm(self.den, A)
        return np.linalg.solve(Q, P)


class FNCombine(FN):
    """Combination of two FNs: add / multiply / divide / compose
    (reference FNCOMBINE, impls/combine/fncombine.c)."""

    def __init__(self, op: str, f1: FN, f2: FN, alpha=1.0, beta=1.0):
        super().__init__(alpha, beta)
        assert op in ("add", "multiply", "divide", "compose")
        self.op = op
        self.f1 = f1
        self.f2 = f2

    def _f(self, x):
        if self.op == "add":
            return self.f1.eval(x) + self.f2.eval(x)
        if self.op == "multiply":
            return self.f1.eval(x) * self.f2.eval(x)
        if self.op == "divide":
            return self.f1.eval(x) / self.f2.eval(x)
        return self.f2.eval(self.f1.eval(x))

    def _fprime(self, x):
        if self.op == "add":
            return self.f1.eval_deriv(x) + self.f2.eval_deriv(x)
        if self.op == "multiply":
            return (self.f1.eval_deriv(x) * self.f2.eval(x)
                    + self.f1.eval(x) * self.f2.eval_deriv(x))
        if self.op == "divide":
            g = self.f2.eval(x)
            return (self.f1.eval_deriv(x) * g
                    - self.f1.eval(x) * self.f2.eval_deriv(x)) / g**2
        return self.f2.eval_deriv(self.f1.eval(x)) * self.f1.eval_deriv(x)

    def _fmat(self, A):
        if self.op == "add":
            return self.f1.eval_mat(A) + self.f2.eval_mat(A)
        if self.op == "multiply":
            return self.f1.eval_mat(A) @ self.f2.eval_mat(A)
        if self.op == "divide":
            return np.linalg.solve(self.f2.eval_mat(A), self.f1.eval_mat(A))
        return self.f2.eval_mat(self.f1.eval_mat(A))


# ---------------------------------------------------------------------------


def _polyvalm(coeffs, A):
    """Horner evaluation of a matrix polynomial (high-to-low coeffs)."""
    n = A.shape[0]
    F = np.zeros_like(A, dtype=np.result_type(A.dtype, float))
    for c in coeffs:
        F = F @ A + c * np.eye(n, dtype=F.dtype)
    return F


def _expm_pade(A, degree: int = 13):
    """Padé scaling-and-squaring exp — own implementation (method 1;
    reference algorithm of fnexp.c:33)."""
    A = np.asarray(A, dtype=np.result_type(A.dtype, float))
    n = A.shape[0]
    nrm = np.linalg.norm(A, 1)
    s = max(0, int(np.ceil(np.log2(nrm / 5.4))) if nrm > 5.4 else 0)
    As = A / (2.0**s)
    # degree-13 Padé coefficients
    b = [64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
         1187353796428800.0, 129060195264000.0, 10559470521600.0,
         670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
         960960.0, 16380.0, 182.0, 1.0]
    I = np.eye(n, dtype=As.dtype)
    A2 = As @ As
    A4 = A2 @ A2
    A6 = A2 @ A4
    U = As @ (A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2)
              + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * I)
    V = (A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2)
         + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * I)
    F = np.linalg.solve(V - U, V + U)
    for _ in range(s):
        F = F @ F
    return F


def _sqrtm_db(A, maxit: int = 50, tol: float = 1e-13):
    Y, _ = _sqrtm_db_pair(A, maxit, tol)
    return Y


def _sqrtm_db_pair(A, maxit: int = 50, tol: float = 1e-13):
    """Denman–Beavers iteration: Y_k -> A^(1/2), Z_k -> A^(-1/2)."""
    A = np.asarray(A, dtype=np.result_type(A.dtype, float))
    n = A.shape[0]
    Y = A.copy()
    Z = np.eye(n, dtype=A.dtype)
    for _ in range(maxit):
        Yn = 0.5 * (Y + np.linalg.inv(Z))
        Zn = 0.5 * (Z + np.linalg.inv(Y))
        if np.linalg.norm(Yn - Y, 1) <= tol * max(np.linalg.norm(Yn, 1), 1e-300):
            Y, Z = Yn, Zn
            break
        Y, Z = Yn, Zn
    return Y, Z


def _realify(F, A):
    """Drop spurious imaginary parts when the input was real."""
    if not np.iscomplexobj(A) and np.iscomplexobj(F):
        if np.linalg.norm(F.imag, 1) <= 1e-12 * max(np.linalg.norm(F.real, 1), 1e-300):
            return F.real
    return F


def fn_from_name(name: str, *args, **kw) -> FN:
    table = {"exp": FNExp, "log": FNLog, "sqrt": FNSqrt, "invsqrt": FNInvSqrt,
             "phi": FNPhi, "rational": FNRational, "combine": FNCombine}
    return table[name](*args, **kw)
