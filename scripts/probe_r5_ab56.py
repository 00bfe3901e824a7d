"""TPU A/B: city10000 K=50% flat6 vs flat5 inner-CG, INTERLEAVED reps.

The round-5 back-to-back probe (probe_r5_city_inner.py) gave
contradictory orderings across two same-day runs (flat5 0.1839 vs flat6
0.2084 at 04:51; flat5 0.2190 vs flat6 0.1986 at 05:40) — tunnel wall
variance (~±15%) swamps the ~13 ms modeled win (55 outers × 1 CG iter
× ~237 µs). Quality is deterministic (flat5 +2.87e-4, flat6 +4.11e-4).
This probe interleaves A/B/A/B... so drift hits both arms equally, and
reports median + IQR over 15 reps per arm.

Usage: python scripts/probe_r5_ab56.py
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

REF_RELAXED = 0.06944591018149751
REF_SOLVE_S = 1.931
REPS = 15


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    arms = {}
    for depth in (6, 5):
        mac = MAC(fixed, cands, n,
                  fiedler_warm_inner_iters=((1, depth),))
        mac.solve(k, x_init, use_cache=True)  # compile + warm
        arms[depth] = (mac, [])

    for rep in range(REPS):
        for depth, (mac, times) in arms.items():
            t0 = time.perf_counter()
            rounded, x, u = mac.solve(k, x_init, use_cache=True)
            times.append(time.perf_counter() - t0)

    for depth, (mac, times) in sorted(arms.items()):
        ts = sorted(times)
        med = statistics.median(ts)
        q1, q3 = ts[len(ts) // 4], ts[3 * len(ts) // 4]
        _, x, _ = mac.solve(k, x_init, use_cache=True)
        lam = scipy_lam2(mac.laplacian(np.asarray(x)))
        print(f"flat{depth}: median {med:.4f}s ({REF_SOLVE_S/med:.2f}x) "
              f"IQR [{q1:.4f}, {q3:.4f}] min {ts[0]:.4f} "
              f"relaxed rel {(lam-REF_RELAXED)/REF_RELAXED:+.2e}",
              flush=True)


if __name__ == "__main__":
    main()
