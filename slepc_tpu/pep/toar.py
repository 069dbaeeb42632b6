"""PEP TOAR-path solver.

Reference: src/pep/impls/krylov/toar/ptoar.c — two-level orthogonal
Arnoldi on the companion linearization, with the Krylov basis held in the
compact tensor form V = (I ⊗ U) S (BVTENSOR) and restarts compressing S.

Round-1 implementation note: this driver runs the same Krylov–Schur
iteration on the *structured* companion pencil — operator applies are
evaluated block-wise against the original {A_i} (never assembled, matching
PEPTOARExtendBasis's d SpMVs + 1 solve per step, ptoar.c:102-167) — while
storing the full d·n basis.  The memory-compact tensor representation
(U sharded, S replicated per SURVEY §7) replaces this storage in a later
milestone; eigenvalues/extraction already match TOAR semantics, including
scalar scaling and target shifts.
"""

from __future__ import annotations

import numpy as np

from ..sys.sort import Which


def toar_solve(pep) -> None:
    from .pep import PEP, _CompanionSinvert  # noqa: F401 (shared machinery)

    # scalar scaling: work on P~(mu) with lambda = sfactor * mu
    sfactor = pep.compute_scale()
    pep.sfactor = sfactor
    if sfactor != 1.0:
        scaled = [pep.mats[i] * (sfactor**i) for i in range(pep.degree + 1)]
        orig_mats = pep.mats
        pep.mats = scaled
        if pep.target is not None:
            orig_target = pep.target
            pep.target = pep.target / sfactor
    try:
        pep._solve_linear()
        if sfactor != 1.0:
            pep.eigenvalues = pep.eigenvalues * sfactor
    finally:
        if sfactor != 1.0:
            pep.mats = orig_mats
            if pep.target is not None:
                pep.target = orig_target
