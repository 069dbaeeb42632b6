"""Partial SVD of a sparse rectangular matrix.

Reference analog: src/svd/tutorials/ex14.c.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

# examples run on CPU by default (TPU compiles take minutes through the
# remote relay); set SLEPC_TPU_EXAMPLES_TPU=1 to run on the chip
if not os.environ.get("SLEPC_TPU_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp

import slepc_tpu as st

rng = np.random.default_rng(0)
A = st.from_scipy(sp.random(500, 300, density=0.02, random_state=rng, format="csr"))
svd = st.SVD(A, nsv=5, solver="trlanczos")
svd.solve()
for i in range(svd.nconv):
    s, u, v = svd.get_singular_triplet(i)
    print(f"sigma_{i} = {s:.9f}   rel.res = {svd.compute_error(i):.2e}")
