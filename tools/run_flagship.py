"""Run ONLY the flagship stage (Chebyshev-amplified 10.35M-row k=20) on
TPU with bench.py's exact configuration — validation driver for the
hardened cheb_accel path without paying for the other bench stages.

Usage: python tools/run_flagship.py [budget_s]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else float(
        os.environ.get("BENCH_FLAGSHIP_BUDGET", "1500"))
    out = {}
    t0 = time.perf_counter()
    bench._flagship(out, budget, bench._log,
                    ncv=int(os.environ.get("BENCH_FLAGSHIP_NCV", "48")))
    out["total_wall_s"] = time.perf_counter() - t0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
