"""Round-3 TPU probe: warm inner-CG schedule A/B on city10000 K=50%.

Late warm Frank-Wolfe steps run ONE capped eigensolver outer iteration
whose cost is dominated by the 10-step preconditioned CG block solve
(~2.3 ms at n=1e4); this probe measures whether shallower inner solves on
late steps (fiedler_warm_inner_iters) save wall-clock without costing
relaxed-objective quality. Each config is a separate compile (the
schedule is static); the dynamic fori_loop bound inside
mac_tpu.ops.cg.pcg_fixed also de-unrolls the CG loop, so config "static"
vs "flat10" isolates that lowering cost.
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

CONFIGS = {
    "static": None,                     # today's default (no dynamic bound)
    "flat10": 10,                       # dynamic bound, same count
    "flat6": 6,
    "late6": ((10, 6),),                # full 10 until the cap-1 regime
    "decay": ((4, 8), (10, 6)),
    "late4": ((10, 4),),
}


from mac_tpu.utils.fiedler import scipy_lam2  # shared quality referee


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        sched = CONFIGS[name]
        mac = MAC(fixed, cands, n, fiedler_warm_inner_iters=sched)
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
        print(f"{name}: warm={med:.4f}s cold={cold:.1f}s "
              f"speedup={REF_S / med:.2f} "
              f"gap={(lam - REF_LAM2) / REF_LAM2:+.2e} "
              f"outers={mac.last_solve_stats['fiedler_iterations']} "
              f"runs={[round(t, 4) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
