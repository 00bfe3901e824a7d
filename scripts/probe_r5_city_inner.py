"""TPU probe: city10000 K=50% inner-CG depth below flat6 (round-5 10x push).

Round-4 found flat6 (0.2280 s / +1.03e-3) beat late6/late4/decay, but never
tried flat5/flat4 from step 1. The round-5 trace (scripts/profile_trace.py)
shows the inner-CG body is 86.7 ms of the 154 ms device program (366
iterations x 237 us), so each inner iteration removed is worth ~14.5 ms.
Sphere2500's flat4 held quality (+2.80e-3, probe_r5_sphere.py); city's
floor is tighter (+4.1e-4 at s32), so measure, don't assume.

Configs (one process, compile amortized): flat6 control, flat5, flat4 at
32 steps; then the winner at 36/40 steps in case deeper FW buys back any
quality the shallower CG costs.

Usage: python scripts/probe_r5_city_inner.py
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


def run(mac, k, x_init, label, reps=5, **kw):
    mac.solve(k, x_init, use_cache=True, **kw)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, use_cache=True, **kw)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    lam_x = scipy_lam2(mac.laplacian(np.asarray(x)))
    lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
    st = dict(mac.last_solve_stats)
    print(f"{label}: {dt:.4f}s ({REF_SOLVE_S/dt:.2f}x) relaxed rel "
          f"{(lam_x-REF_RELAXED)/REF_RELAXED:+.2e} rounded {lam_r:.6f} "
          f"stats={st}", flush=True)
    return dt


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    run(MAC(fixed, cands, n), k, x_init, "flat6 s32 (default)")
    for depth in (5, 4):
        mac = MAC(fixed, cands, n,
                  fiedler_warm_inner_iters=((1, depth),))
        run(mac, k, x_init, f"flat{depth} s32")
    # Winner re-check at more FW steps (same cheap-step policy knobs the
    # automatic path uses: tail averaging on, duality stop off).
    for steps in (36, 40):
        mac = MAC(fixed, cands, n, fiedler_warm_inner_iters=((1, 4),))
        mac._tail_average_user_set = True
        mac.fw_tail_average = True
        run(mac, k, x_init, f"flat4 s{steps}", max_iters=steps,
            relative_duality_gap_tol=0.0)


if __name__ == "__main__":
    main()
