"""Standard symmetric eigenproblem on the 1-D Laplacian.

Reference analog: src/eps/tutorials/ex1.c.
Run: python examples/ex1_laplacian.py [-eps_nev 6 -eps_type krylovschur ...]
"""

import sys

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

# examples run on CPU by default (TPU compiles take minutes through the
# remote relay); set SLEPC_TPU_EXAMPLES_TPU=1 to run on the chip
if not os.environ.get("SLEPC_TPU_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np

import slepc_tpu as st

st.set_global_options(" ".join(sys.argv[1:]))
n = 300
A = st.laplacian_1d(n)
print(f"\n1-D Laplacian Eigenproblem, n={n}\n")
eps = st.EPS(A, problem_type="hep", which="smallest_real", nev=4)
eps.solve()
eps.view()
eps.error_view()
exact = st.mat.generators.laplacian_1d_eigs(n, k=eps.nconv)
print("max deviation from closed form:",
      float(np.max(np.abs(np.sort(eps.eigenvalues.real) - exact))))
