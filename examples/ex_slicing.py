"""All eigenvalues in an interval: inertia-certified spectrum slicing.

Reference analog: EPS_ALL interval solves (ks-slice.c machinery).
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

# examples run on CPU by default (TPU compiles take minutes through the
# remote relay); set SLEPC_TPU_EXAMPLES_TPU=1 to run on the chip
if not os.environ.get("SLEPC_TPU_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np

import slepc_tpu as st

A = st.laplacian_2d(20, 19)
eps = st.EPS(A, problem_type="hep")
eps.set_interval(0.5, 1.0)
eps.solve()
print(f"eigenvalues in [0.5, 1.0]: {eps.nconv}")
print(np.round(np.sort(eps.eigenvalues.real), 6))
