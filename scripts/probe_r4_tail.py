"""Phase breakdown of the solve tail (device FW vs fw_polish vs
round_guard) on the small banded-f32 datasets where the exact host
phases fire. Round-4: intel regressed 0.126 -> 0.239 s and sphere2500
0.147 -> 0.584 s after the guard landed; this shows where it goes.

Usage: python scripts/probe_r4_tail.py [dataset ...]
"""

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy
from mac_tpu.utils.fiedler import scipy_lam2


def run(name):
    measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    mac = MAC(fixed, cands, n)
    mac.solve(k, x_init, use_cache=True)  # warm
    times, stats = [], None
    for _ in range(3):
        t0 = time.perf_counter()
        rounded, unrounded, upper = mac.solve(k, x_init, use_cache=True)
        times.append(time.perf_counter() - t0)
        stats = dict(mac.last_solve_stats)
    med = statistics.median(times)
    lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
    print(json.dumps(dict(
        dataset=name, total_s=round(med, 4),
        solve_total_s=round(stats.get("solve_total_s", 0.0), 4),
        fw_time_s=round(stats.get("fw_time_s", 0.0), 4),
        polish_time_s=round(stats.get("polish_time_s", 0.0), 4),
        guard_time_s=round(stats.get("guard_time_s", 0.0), 4),
        exact_evals=stats.get("exact_evals"),
        polished=stats.get("polished"),
        round_guard=stats.get("round_guard"),
        fw_iterations=stats.get("fw_iterations"),
        fiedler_iterations=stats.get("fiedler_iterations"),
        lam2_rounded=lam_r)), flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["intel", "sphere2500"]:
        run(name)
