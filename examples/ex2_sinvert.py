"""Interior eigenvalues via shift-and-invert (2-D Laplacian).

Reference analog: src/eps/tutorials/ex2.c + -st_type sinvert usage.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

# examples run on CPU by default (TPU compiles take minutes through the
# remote relay); set SLEPC_TPU_EXAMPLES_TPU=1 to run on the chip
if not os.environ.get("SLEPC_TPU_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import slepc_tpu as st

A = st.laplacian_2d(40, 40)
eps = st.EPS(A, problem_type="hep", nev=5)
eps.set_target(1.0)
eps.solve()
eps.error_view()
