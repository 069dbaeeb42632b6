"""Non-symmetric Markov chain model (dominant eigenvalue 1).

Reference analog: src/eps/tutorials/ex5.c.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

# examples run on CPU by default (TPU compiles take minutes through the
# remote relay); set SLEPC_TPU_EXAMPLES_TPU=1 to run on the chip
if not os.environ.get("SLEPC_TPU_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import slepc_tpu as st

A = st.mat.generators.markov(15)
eps = st.EPS(A, problem_type="nhep", which="largest_real", nev=4)
eps.solve()
eps.error_view()
