"""TPU probe: sphere2500 K=50% operating point (VERDICT r4 weak #6 —
slowest banded solve, 1.73x r3 / 1.41x r4-with-polish, and all round-4
tuning was city10000-only; CPU screens proved sign-flipping, so measure
ON TPU).

Configs, all in one process (compile amortized):
  A  pure default solve (round-5 polish pre-gate active)
  B  explicit fw_polish=False (should now match A on time)
  S  step-count sweep with the auto policy replicated (schedule, tail
     averaging, duality stop off) at 24/28/32 steps
  I  inner-CG flat4 at the best step count

Reports warm median-of-3 solve seconds + relaxed/rounded quality vs the
reference's canonical 20-step optimum (scipy eigsh f64 referee both
sides) + last_solve_stats.

Usage: python scripts/probe_r5_sphere.py
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

REF_RELAXED = 0.23430047503258467
REF_ROUNDED = 0.0008836840861247152
REF_SOLVE_S = 0.605


def run(mac, k, x_init, label, reps=3, **kw):
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
          f"(ref {REF_ROUNDED:.6f}) stats={st}", flush=True)
    return dt


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "sphere2500.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    mac = MAC(fixed, cands, n)
    run(mac, k, x_init, "A default")

    mac_np = MAC(fixed, cands, n, fw_polish=False)
    mac_np.round_guard = mac.round_guard
    run(mac_np, k, x_init, "B polish-off")

    for steps in (24, 28, 32):
        m2 = MAC(fixed, cands, n, fw_polish=False)
        m2._warm_schedule = ((1, 4), (4, 2), (10, 1))
        m2._tail_average_user_set = True
        m2.fw_tail_average = True
        run(m2, k, x_init, f"S s{steps}", max_iters=steps,
            relative_duality_gap_tol=0.0)

    m3 = MAC(fixed, cands, n, fw_polish=False,
             fiedler_warm_inner_iters=((1, 4),))
    m3._warm_schedule = ((1, 4), (4, 2), (10, 1))
    m3._tail_average_user_set = True
    m3.fw_tail_average = True
    run(m3, k, x_init, "I flat4 s32", max_iters=32,
        relative_duality_gap_tol=0.0)


if __name__ == "__main__":
    main()
