"""Action of the matrix exponential y = exp(tA) v.

Reference analog: src/mfn/tutorials/ex23.c.
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

n = 400
A = st.laplacian_1d(n) * (-1.0)  # heat equation generator
b = np.ones(n)
fn = st.FNExp()
fn.set_scale(0.1)  # inner scale: t = 0.1
for solver in ("krylov", "expokit"):
    mfn = st.MFN(A, fn, ncv=30, solver=solver)
    y = np.asarray(mfn.solve(b))
    print(f"{solver}: ||y|| = {np.linalg.norm(y):.12f}  (its={mfn.its})")
