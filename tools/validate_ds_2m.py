"""Mid-scale TPU validation: cheb flagship driver with rot_mode=ds.

Mirrors the round-5 2.1M validation point (deg300/ncv48/nrot40/kd3/
m_extra12, nev=20 tol 1e-8) A/B exact vs ds rotation.  Run SOLO.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax

import slepc_tpu  # x64
from slepc_tpu.eps.cheb_accel import ks_cheb_smallest
from slepc_tpu.mat.generators import laplacian_2d, laplacian_2d_eigs
from slepc_tpu.ops.dia_pallas import DIAPaddedOperatorDS

side = 1449
A = laplacian_2d(side, side, dtype=np.float64)
op = DIAPaddedOperatorDS.from_dia(A)
exact_eigs = laplacian_2d_eigs(side, side, k=20)

for rm in (sys.argv[1:] or ["ds", "exact"]):
    t0 = time.time()
    res = ks_cheb_smallest(op, nev=20, tol=1e-8, ncv=48, degree=300,
                           key=jax.random.PRNGKey(12345), budget_s=900,
                           keep_den=3, rot_mode=rm, nrot=40, m_extra=12,
                           log=lambda m: print(f"  [{rm}] {m}",
                                               file=sys.stderr, flush=True))
    wall = time.time() - t0
    got = np.sort(res["lam"][:20])
    dlam = np.abs(got - exact_eigs).max() / np.abs(exact_eigs).max()
    print(f"{rm}: nconv={res['nconv']} wall={wall:.0f}s "
          f"cycles={res['stats']['cycles']} cols={res['stats']['cols']} "
          f"maxresid={float(np.max(res['resid'][:20])):.2e} "
          f"rel_dlam={dlam:.2e}", flush=True)
