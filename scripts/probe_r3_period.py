"""Round-3 TPU probe: coarse-preconditioner refresh cadence A/B.

Solves city10000 K=50% at precond_refresh_period in {1, 2, 3, 4} under the
automatic policy and reports warm median, total eigensolver outers, and
the scipy-f64 relaxed-objective gap vs the reference optimum. The skip
(mac_tpu.ops.banded.make_banded_precond rebuild=False branch) saves the
nc-column coarse assembly + Newton-Schulz (~1.7 ms) AND the chain LDL^T
refactorization (~0.5 ms at CHAIN_LDL_BLOCK=128) per skipped step; the
question is whether the stale preconditioner costs outer iterations.
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy

REF_LAM2 = 0.06944591018149751
REF_S = 1.931


from mac_tpu.utils.fiedler import scipy_lam2  # shared quality referee


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    periods = [int(p) for p in sys.argv[1:]] or [1, 2, 3, 4]
    for period in periods:
        mac = MAC(fixed, cands, n, precond_refresh_period=period)
        t0 = time.perf_counter()
        mac.solve(k, x_init, use_cache=True)
        cold = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            rounded, x, u = mac.solve(k, x_init, use_cache=True)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        lam = scipy_lam2(mac.laplacian(np.asarray(x)))
        print(f"period={period}: warm={med:.4f}s cold={cold:.1f}s "
              f"speedup={REF_S / med:.2f} gap={(lam - REF_LAM2) / REF_LAM2:+.2e} "
              f"outers={mac.last_solve_stats['fiedler_iterations']} "
              f"runs={[round(t, 4) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
