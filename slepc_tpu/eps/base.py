"""EPS — linear eigenproblem solver front-end.

Reference: src/eps/interface/ (epsbasic.c, epssetup.c, epssolve.c,
epsdefault.c, epsopts.c).  The EPS object owns the problem definition
(operators, problem type, which/target/interval, dimensions nev/ncv/mpd,
tolerances), its child objects (ST, BV, DS-equivalents, RG), monitors, and
the solve-state (nconv, eigenvalues, basis).  Algorithms are pluggable
solver classes dispatched by name — the functional analog of the _EPSOps
function-pointer table (include/slepc/private/epsimpl.h:26-39).
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, List, Optional, Type

import jax.numpy as jnp
import numpy as np

from ..bv.bv import BV
from ..mat.linop import LinearOperator
from ..rg.rg import RG
from ..st.st import ST, STShift, STSinvert
from ..sys.monitor import Monitor
from ..sys.options import Options, get_global_options
from ..sys.sort import SortCriterion, Which


class ProblemType(enum.Enum):
    HEP = "hep"  # Hermitian
    GHEP = "ghep"  # generalized Hermitian, B > 0
    NHEP = "nhep"  # non-Hermitian
    GNHEP = "gnhep"  # generalized non-Hermitian
    PGNHEP = "pgnhep"  # gen. non-Hermitian with positive-definite B
    GHIEP = "ghiep"  # gen. Hermitian-indefinite
    BSE = "bse"  # structured Bethe-Salpeter


class EPSConvergedReason(enum.IntEnum):
    CONVERGED_TOL = 1
    CONVERGED_USER = 2
    DIVERGED_ITS = -1
    DIVERGED_BREAKDOWN = -2
    DIVERGED_SYMMETRY_LOST = -3
    ITERATING = 0


class EPSError(RuntimeError):
    pass


_DEFAULT_TOL = {np.dtype(np.float64): 1e-8, np.dtype(np.float32): 1e-5,
                np.dtype(np.complex128): 1e-8, np.dtype(np.complex64): 1e-5}


class EPS:
    """Linear eigensolver: A x = lambda x or A x = lambda B x."""

    _solvers: Dict[str, Type["EPSSolver"]] = {}

    @classmethod
    def register(cls, name: str, solver: Type["EPSSolver"]) -> None:
        cls._solvers[name] = solver

    def __init__(self, A: Optional[LinearOperator] = None,
                 B: Optional[LinearOperator] = None, *,
                 problem_type: Optional[str | ProblemType] = None,
                 which: str | Which = Which.LARGEST_MAGNITUDE,
                 nev: int = 1, ncv: Optional[int] = None, mpd: Optional[int] = None,
                 tol: Optional[float] = None, max_it: Optional[int] = None,
                 solver: str = "krylovschur", target: Optional[complex] = None,
                 interval: Optional[tuple] = None,
                 options: Optional[Options] = None, prefix: str = "eps_"):
        self.A = A
        self.B = B
        self.problem_type = ProblemType(problem_type) if problem_type else None
        self.which = Which(which) if not isinstance(which, Which) else which
        self.nev = nev
        self.ncv = ncv
        self.mpd = mpd
        self.tol = tol
        self.max_it = max_it
        self.solver_name = solver
        self.target = target
        self.interval = interval
        self.st: Optional[ST] = None
        self.rg: Optional[RG] = None
        self.bv: Optional[BV] = None
        self.monitor = Monitor()
        self.stopping: Optional[Callable] = None
        self.conv_test = "rel"  # rel | abs | norm (EPSSetConvergenceTest)
        self.purify = True
        self.balance = None  # None | 'krylov' (EPSSetBalance)
        self.balance_its = 5
        self.extraction = "ritz"  # ritz | harmonic (EPSSetExtraction)
        self.initial_space: Optional[np.ndarray] = None
        self.deflation_space: Optional[np.ndarray] = None
        self.true_residual = False
        self.arbitrary: Optional[Callable] = None
        self.two_sided = False
        # solve state
        self.nconv = 0
        self.its = 0
        # search-space expansions (basis-growth steps): the honest cost
        # unit for Davidson-family A/Bs — the fused GD cycle runs ncv-j0
        # expansions per outer `its` while the host loop runs ~1
        self.expansions = 0
        self.reason = EPSConvergedReason.ITERATING
        self.eigenvalues: np.ndarray = np.array([])
        self.errests: np.ndarray = np.array([])
        self._eigenvectors: Optional[np.ndarray] = None
        self._left_eigenvectors: Optional[np.ndarray] = None
        self.V: Optional[BV] = None
        self.W: Optional[BV] = None  # left basis (two-sided)
        # options database
        opts = options if options is not None else get_global_options()
        self.options = opts.child(prefix) if opts.prefix == "" else opts
        self._apply_options()
        self._setup_done = False

    # -- configuration ----------------------------------------------------
    def _apply_options(self):
        o = self.options
        self.nev = int(o.get("nev", self.nev))
        if "ncv" in o:
            self.ncv = int(o["ncv"])
        if "mpd" in o:
            self.mpd = int(o["mpd"])
        if "tol" in o:
            self.tol = float(o["tol"])
        if "max_it" in o:
            self.max_it = int(o["max_it"])
        if "type" in o:
            self.solver_name = str(o["type"])
        if "target" in o:
            self.target = complex(o["target"])
            self.which = Which.TARGET_MAGNITUDE
        for w in Which:
            if f"{w.value}" == o.get("which"):
                self.which = w
            if o.get(w.value, False) is True:  # -eps_largest_real style
                self.which = w
        for pt in ProblemType:
            if o.get(pt.value, False) is True:
                self.problem_type = pt
        # ---- the broader -eps_* surface (reference epsopts.c) ----
        if "interval" in o:  # -eps_interval a,b
            iv = o["interval"]
            if isinstance(iv, str):
                a, b = (float(t) for t in iv.split(","))
            else:
                a, b = iv
            self.set_interval(a, b)
        for ct in ("rel", "abs", "norm"):
            if o.get(f"conv_{ct}", False) is True:
                self.conv_test = ct
        if "conv_test" in o:
            self.conv_test = str(o["conv_test"])
        if o.get("true_residual", False) is True:
            self.true_residual = True
        if o.get("harmonic", False) is True or o.get("extraction") == "harmonic":
            self.extraction = "harmonic"
        if "balance" in o:
            self.balance = (o["balance"] if isinstance(o["balance"], str)
                            else "krylov")
        if "purify" in o:
            self.purify = bool(o["purify"])
        if o.get("two_sided", False) is True:
            self.two_sided = True
        if "lanczos_reorthog" in o:
            self.set_reorthogonalization(str(o["lanczos_reorthog"]))
        if "block_size" in o:
            self.block_size = int(o["block_size"])
        if "cheb_degree" in o:  # Chebyshev-amplified smallest-end path
            self.cheb_degree = int(o["cheb_degree"])
        if "partitions" in o:  # -eps_krylovschur_partitions analog
            self.slice_npart = int(o["partitions"])
        if "gd_blocksize" in o or "jd_blocksize" in o:
            self.davidson_bs = int(o.get("gd_blocksize",
                                         o.get("jd_blocksize", 1)))
        if "jd_fix" in o:
            self.jd_fix = float(o["jd_fix"])
        # monitors (reference -eps_monitor / _all / _conv, epsmon.c)
        from ..sys.monitor import ConvMonitor, monitor_all, monitor_first

        if o.get("monitor", False) is True:
            self.monitor.add(monitor_first)
        if o.get("monitor_all", False) is True:
            self.monitor.add(monitor_all)
        if o.get("monitor_conv", False) is True:
            self.monitor.add(ConvMonitor())
        # post-solve viewers (reference -eps_view / -eps_converged_reason /
        # -eps_error_relative, epssolve.c:97-113)
        self._view_on_solve = o.get("view", False) is True
        self._error_view_on_solve = (
            o.get("error_relative", False) is True
            or o.get("error_absolute", False) is True)
        self._reason_view_on_solve = o.get("converged_reason", False) is True

    def set_operators(self, A: LinearOperator, B: Optional[LinearOperator] = None):
        self.A = A
        self.B = B
        self._setup_done = False
        return self

    def set_problem_type(self, pt: str | ProblemType):
        self.problem_type = ProblemType(pt) if isinstance(pt, str) else pt
        return self

    def set_type(self, name: str):
        self.solver_name = name
        return self

    def set_which(self, which: str | Which, target: Optional[complex] = None):
        self.which = Which(which) if isinstance(which, str) else which
        if target is not None:
            self.target = target
        return self

    def set_target(self, target: complex):
        self.target = target
        if self.which not in (Which.TARGET_MAGNITUDE, Which.TARGET_REAL,
                              Which.TARGET_IMAGINARY):
            self.which = Which.TARGET_MAGNITUDE
        return self

    def set_interval(self, a: float, b: float):
        self.interval = (a, b)
        self.which = Which.ALL
        return self

    def set_dimensions(self, nev: Optional[int] = None, ncv: Optional[int] = None,
                       mpd: Optional[int] = None):
        if nev is not None:
            self.nev = nev
        if ncv is not None:
            self.ncv = ncv
        if mpd is not None:
            self.mpd = mpd
        return self

    def set_tolerances(self, tol: Optional[float] = None, max_it: Optional[int] = None):
        if tol is not None:
            self.tol = tol
        if max_it is not None:
            self.max_it = max_it
        return self

    def set_st(self, st: ST):
        self.st = st
        return self

    def set_rg(self, rg: RG):
        self.rg = rg
        return self

    def set_initial_space(self, X):
        self.initial_space = np.asarray(X)
        if self.initial_space.ndim == 1:
            self.initial_space = self.initial_space[:, None]
        return self

    def set_deflation_space(self, X):
        self.deflation_space = np.asarray(X)
        if self.deflation_space.ndim == 1:
            self.deflation_space = self.deflation_space[:, None]
        return self

    def set_partitions(self, npart: int):
        """Concurrent partitions for spectrum slicing and task-parallel
        contour solves (reference: EPSKrylovSchurSetPartitions)."""
        self.slice_npart = int(npart)
        return self

    def set_power_nonlinear(self, A_of_x, B_of_x=None):
        """Nonlinear inverse power iteration A(x) x = lambda B(x) x
        (reference: EPSPowerSetNonlinear + SNES update, power.c).
        Callbacks map the current iterate to LinearOperators."""
        self.power_nonlinear = (A_of_x, B_of_x)
        self.solver_name = "power"
        return self

    def set_convergence_test(self, name: str):
        assert name in ("rel", "abs", "norm")
        self.conv_test = name
        return self

    def set_monitor(self, fn):
        self.monitor.add(fn)
        return self

    def set_two_sided(self, flg: bool = True):
        self.two_sided = flg
        return self

    def set_balance(self, kind: str = "krylov", its: int = 5):
        """Enable matrix-free balancing for non-Hermitian problems
        (reference EPSSetBalance; Chen-Demmel Krylov balancing)."""
        self.balance = kind
        self.balance_its = its
        return self

    def set_arbitrary_selection(self, fn):
        """Sort candidates by a user functional of (value, Ritz vector)
        (reference EPSSetArbitrarySelection); smaller = wanted first."""
        self.arbitrary = fn
        return self

    def set_true_residual(self, flg: bool = True):
        """Confirm convergence with explicit residuals on the ORIGINAL
        problem instead of the transformed-space Krylov estimate
        (reference EPSSetTrueResidual)."""
        self.true_residual = flg
        return self

    def set_reorthogonalization(self, kind: str, period: int = 4):
        """Orthogonalization policy for the jitted HEP Lanczos fast path
        (reference -eps_lanczos_reorthog, lanczos.c EPSLanczosReorthogType):
        'full' (CGS2 every column, default), 'partial' (Simon omega-
        recurrence drift monitor — local 3-term orth, full sweep only when
        the estimate crosses sqrt(eps); large bandwidth win at scale),
        'periodic' (every `period` columns — explicit Lanczos runs it
        as-is; the Krylov-Schur fast path substitutes the monitored
        'partial' mode, an unmonitored period loses orthogonality over
        many restarts), 'selective' (Parlett-Scott formed-Ritz-vector
        orthogonalization, explicit Lanczos), 'local' (bare 3-term),
        'delayed' (reference latency-hiding variant — subsumed by the
        fused-reduction jitted cycle; maps to 'full')."""
        assert kind in ("full", "partial", "periodic", "selective",
                        "delayed", "local")
        self.reorth = kind
        if kind == "periodic":
            self.reorth_period = period
        return self

    def set_extraction(self, kind: str):
        """'ritz' (default) or 'harmonic' (interior-friendly projected
        extraction; reference EPSSetExtraction EPS_HARMONIC).

        Harmonic extraction improves selection and restart for targets in
        the interior of the spectrum without factorizing (plain STShift).
        Like the reference, convergence on targets DEEP inside a strongly
        non-normal spectrum remains slow — shift-and-invert is the robust
        route there.
        """
        assert kind in ("ritz", "harmonic")
        self.extraction = kind
        return self

    # -- derived defaults --------------------------------------------------
    @property
    def n(self) -> int:
        return self.A.shape[0]

    @property
    def is_hermitian(self) -> bool:
        return self.problem_type in (ProblemType.HEP, ProblemType.GHEP,
                                     ProblemType.BSE)

    @property
    def is_generalized(self) -> bool:
        return self.B is not None

    def _default_dims(self):
        """ncv = min(n, max(2 nev, nev+15)), mpd cap for large nev
        (reference: EPSSetDimensions_Default, epssetup.c:654-678)."""
        n, nev = self.n, self.nev
        if self.ncv is None:
            if self.mpd is not None:
                self.ncv = min(n, nev + self.mpd)
            elif nev < 500:
                self.ncv = min(n, max(2 * nev, nev + 15))
            else:
                self.mpd = 500
                self.ncv = min(n, nev + self.mpd)
        if self.mpd is None:
            self.mpd = self.ncv
        self.ncv = max(self.ncv, self.nev + 1) if self.ncv < n else self.ncv
        self.ncv = min(self.ncv, n)
        self.mpd = min(self.mpd, self.ncv)

    def _default_tol(self):
        if self.tol is None:
            self.tol = _DEFAULT_TOL.get(np.dtype(self.A.dtype), 1e-8)
        if self.max_it is None:
            self.max_it = max(100, 2 * self.n // max(self.ncv, 1))

    def _default_st(self):
        if self.st is None:
            hermitian = self.problem_type in (
                ProblemType.HEP, ProblemType.GHEP)
            mats = [self.A] if self.B is None else [self.A, self.B]
            # ST options live under the global "st_" prefix (the reference's
            # default ST prefix), not nested under "eps_"
            sto = Options(self.options._values, "st_") if self.options else None
            st_type = sto.get("type") if sto else None
            ksp_opts = {}
            if sto and "ksp_type" in sto:
                ksp_opts["ksp_type"] = sto["ksp_type"]
            sigma_opt = sto.get("shift") if sto else None
            if st_type is not None:
                from ..st.st import STCayley, STPrecond

                table = {"shift": STShift, "sinvert": STSinvert,
                         "cayley": STCayley, "precond": STPrecond}
                cls = table.get(str(st_type))
                if cls is None:
                    raise EPSError(f"unknown st_type {st_type!r}; "
                                   f"available: {sorted(table)}")
                sigma = complex(sigma_opt) if sigma_opt is not None else (
                    self.target if self.target is not None else 0.0)
                if sigma.imag == 0:
                    sigma = sigma.real
                kw = {"ksp_opts": ksp_opts} if ksp_opts else {}
                if cls is STSinvert:
                    kw["hermitian"] = hermitian
                self.st = cls(mats, sigma=sigma, **kw)
                if (cls in (STSinvert, STCayley) and self.target is None):
                    # sinvert without an explicit target: the wanted pairs
                    # are those nearest the shift (largest in the
                    # transformed spectrum) — align the sort criterion
                    self.target = sigma
                    self.which = Which.TARGET_MAGNITUDE
            elif self.target is not None or self.interval is not None:
                sigma = self.target if self.target is not None else (
                    self.interval[0] if self.interval else 0.0)
                self.st = STSinvert(mats, sigma=sigma, hermitian=hermitian,
                                    ksp_opts=ksp_opts or None)
            else:
                self.st = STShift(mats, sigma=0.0)

    def _infer_problem_type(self):
        if self.problem_type is None:
            # conservative default, as the reference requires the user to
            # declare Hermitian structure (EPSSetProblemType)
            self.problem_type = (ProblemType.GNHEP if self.is_generalized
                                 else ProblemType.NHEP)

    def sort_criterion(self) -> SortCriterion:
        """Sorting happens in the *transformed* spectrum, like the
        reference routing SlepcSCCompare through the ST map."""
        return SortCriterion(which=self.which,
                             target=self.target if self.target is not None else 0.0)

    # -- solve -------------------------------------------------------------
    def setup(self):
        if self.A is None:
            raise EPSError("operators not set")
        self._infer_problem_type()
        self._default_dims()
        self._default_tol()
        self._default_st()
        if (self.deflation_space is not None
                and getattr(self.st, "name", "") in ("sinvert", "cayley")):
            # singular-pencil support: deflation vectors that lie in the
            # nullspace of A - sigma*B get attached to the factorization's
            # KSP (reference: EPSSetUp -> STCheckNullSpace, epssetup.c)
            self.st.check_null_space(self.deflation_space)
        self._setup_done = True
        return self

    def solve(self):
        """Run the configured solver (reference: EPSSolve, epssolve.c:119)."""
        if not self._setup_done:
            self.setup()
        cls = self._solvers.get(self.solver_name)
        if cls is None:
            raise EPSError(
                f"unknown EPS solver {self.solver_name!r}; "
                f"available: {sorted(self._solvers)}")
        self.its = 0
        self.nconv = 0
        self.expansions = 0
        self.reason = EPSConvergedReason.ITERATING
        solver = cls()
        solver.solve(self)
        if self.two_sided and self.nconv > 0 and self._left_eigenvectors is None:
            self._solve_left(cls)
        if self.reason == EPSConvergedReason.ITERATING:
            self.reason = (EPSConvergedReason.CONVERGED_TOL
                           if self.nconv >= self.nev else EPSConvergedReason.DIVERGED_ITS)
        # best-first ordering of converged pairs
        if self.nconv > 1 and self._eigenvectors is not None:
            sc = SortCriterion(self.which, self.target or 0.0)
            perm = sc.argsort(self.eigenvalues[: self.nconv])
            self.eigenvalues[: self.nconv] = self.eigenvalues[perm]
            self.errests[: self.nconv] = self.errests[perm]
            self._eigenvectors = self._eigenvectors[:, perm]
            if self._left_eigenvectors is not None:
                self._left_eigenvectors = self._left_eigenvectors[:, perm]
        if getattr(self, "_reason_view_on_solve", False):
            verb = ("CONVERGED" if self.reason.value > 0 else "DIVERGED")
            print(f"EPS solve {verb}: {self.nconv} eigenpairs, reason "
                  f"{self.reason.name}, iterations {self.its}")
        if getattr(self, "_view_on_solve", False):
            self.view()
        if getattr(self, "_error_view_on_solve", False):
            self.error_view()
        return self

    def _solve_left(self, solver_cls):
        """Two-sided: left eigenvectors from a run on the adjoint problem
        A^H y = conj(lambda) B^H y, matched to the right pairs.

        Reference: ks-twosided.c builds both Krylov spaces in one coupled
        recurrence; the dual-run formulation here computes the same pairs
        (a BiKS coupled variant is a planned refinement).
        """
        from ..mat.linop import AdjointOperator

        if self.is_hermitian and self.B is None:
            self._left_eigenvectors = self._eigenvectors.copy()
            return
        left = EPS(AdjointOperator(self.A),
                   None if self.B is None else AdjointOperator(self.B),
                   problem_type=self.problem_type.value,
                   which=self.which, nev=self.nev, ncv=self.ncv,
                   tol=self.tol, max_it=self.max_it, solver=self.solver_name,
                   target=np.conj(self.target) if self.target is not None else None)
        left.solve()
        if left.nconv == 0:
            return
        Y = left._eigenvectors
        wl = left.eigenvalues[: left.nconv]
        used = np.zeros(left.nconv, bool)
        Ym = np.zeros((self.n, self.nconv), dtype=Y.dtype)
        for i in range(self.nconv):
            lam = self.eigenvalues[i]
            d = np.abs(wl - np.conj(lam)) + np.where(used, np.inf, 0.0)
            j = int(np.argmin(d))
            used[j] = True
            Ym[:, i] = Y[:, j]
        self._left_eigenvectors = Ym

    # -- checkpoint / resume ------------------------------------------------
    def save_state(self, path: str):
        """Persist solver state to an .npz file so a later run can resume
        (reference parity: results/vectors via PETSc binary viewers,
        epssolve.c:110,188-199, plus EPSSetInitialSpace warm starts; the
        iteration-state bundle here extends that with the Krylov basis)."""
        basis = np.asarray(self.V.array) if self.V is not None else None
        np.savez(path,
                 eigenvalues=self.eigenvalues,
                 eigenvectors=(self._eigenvectors
                               if self._eigenvectors is not None
                               else np.zeros((self.n, 0))),
                 errests=self.errests,
                 nconv=self.nconv,
                 its=self.its,
                 basis=basis if basis is not None else np.zeros((0, 0)))
        return self

    def load_state(self, path: str):
        """Warm-start this solver from a saved state: converged vectors
        (and any leftover basis columns) become the initial space, so the
        restarted Krylov run converges in few iterations."""
        d = np.load(path)
        X = d["eigenvectors"]
        basis = d["basis"]
        cols = []
        if X.size:
            # first column = sum of converged vectors: the Krylov start
            # vector then has components along every wanted direction; a
            # tiny random perturbation guards the exactly-invariant corner
            # (breakdown at step nconv) without slowing re-convergence
            v0 = X.sum(axis=1, keepdims=True)
            rng = np.random.default_rng(1)
            pert = 100.0 * np.finfo(
                np.dtype(self.A.dtype) if self.A is not None
                and np.issubdtype(np.dtype(self.A.dtype), np.floating)
                else np.float64).eps
            v0 = v0 + pert * np.linalg.norm(v0) * rng.standard_normal(
                v0.shape) / np.sqrt(v0.shape[0])
            cols.append(v0)
            cols.append(X)
        if basis.size:
            # a few extra basis directions beyond the converged ones
            extra = basis[:, X.shape[1]: X.shape[1] + 4]
            if extra.size:
                cols.append(extra)
        if cols:
            init = np.concatenate(cols, axis=1)
            if self.A is not None and not np.issubdtype(
                    np.dtype(self.A.dtype), np.complexfloating):
                init = init.real if np.iscomplexobj(init) else init
            self.set_initial_space(init)
        return self

    # -- results -----------------------------------------------------------
    def get_converged(self) -> int:
        return self.nconv

    def get_eigenvalue(self, i: int):
        if i >= self.nconv:
            raise EPSError(f"only {self.nconv} converged pairs")
        return self.eigenvalues[i]

    def get_eigenpair(self, i: int):
        lam = self.get_eigenvalue(i)
        x = None if self._eigenvectors is None else self._eigenvectors[:, i]
        return lam, x

    def get_left_eigenvector(self, i: int):
        if self._left_eigenvectors is None:
            raise EPSError("no left eigenvectors (enable two_sided)")
        return self._left_eigenvectors[:, i]

    def get_eigenvectors(self) -> np.ndarray:
        return self._eigenvectors[:, : self.nconv]

    def get_error_estimate(self, i: int) -> float:
        return float(self.errests[i])

    def compute_error(self, i: int, error_type: str = "relative") -> float:
        """Explicit residual ||A x - lambda B x|| (/|lambda| if relative)
        (reference: EPSComputeError)."""
        lam, x = self.get_eigenpair(i)
        x = jnp.asarray(x)
        r = self.A.mult(x)
        bx = self.B.mult(x) if self.B is not None else x
        r = r - lam * bx
        res = float(jnp.linalg.norm(r)) / max(float(jnp.linalg.norm(x)), 1e-300)
        if error_type == "relative":
            return res / max(abs(lam), 1e-300)
        return res

    def view(self):
        """Print the solver configuration (reference: EPSView, epsview.c)."""
        lines = [
            "EPS Object:",
            f"  solver: {self.solver_name}",
            f"  problem type: {self.problem_type.value if self.problem_type else '(unset)'}",
            f"  which: {self.which.value}"
            + (f" (target={self.target})" if self.target is not None else "")
            + (f" (interval={self.interval})" if self.interval is not None else ""),
            f"  dimensions: nev={self.nev} ncv={self.ncv} mpd={self.mpd}",
            f"  tolerances: tol={self.tol} max_it={self.max_it}",
            f"  convergence test: {self.conv_test}",
        ]
        if self.st is not None:
            lines.append(f"  ST: type={self.st.name} sigma={self.st.sigma}")
            if getattr(self.st, "ksp", None) is not None:
                lines.append(f"    KSP: method={self.st.ksp.method}")
        if self.rg is not None:
            lines.append(f"  RG: {type(self.rg).__name__}")
        s = "\n".join(lines)
        print(s)
        return s

    def error_view(self):
        lines = [f"nconv={self.nconv} reason={self.reason.name} its={self.its}"]
        for i in range(self.nconv):
            lam = self.eigenvalues[i]
            lines.append(f"  lambda[{i}] = {lam:.9g}  rel.err = {self.compute_error(i):.3e}")
        s = "\n".join(lines)
        print(s)
        return s

    # -- shared convergence machinery ---------------------------------------
    def conv_measure(self, theta: complex, res: float) -> float:
        """Error measure per convergence-test setting (reference:
        EPSConvergedRelative/Absolute/Norm, epsdefault.c:224-287)."""
        if self.conv_test == "abs":
            return res
        if self.conv_test == "norm":
            nrm = getattr(self, "_op_norm", None)
            if nrm is None:
                nrm = abs(theta)
            return res / max(abs(theta) + nrm, 1e-300)
        return res / max(abs(theta), 1e-300)


class EPSSolver:
    """Base class for EPS algorithm implementations."""

    def solve(self, eps: EPS) -> None:
        raise NotImplementedError
