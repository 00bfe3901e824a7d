"""Round-3 TPU probe: the STACKED fast-path candidates on city10000 K=50%.

Combines the individually quality-screened levers (CPU screens in
probe_r3_quality_screen / the steps screen — all hold the relaxed gap
positive): preconditioner-rebuild cadence 3, late-step inner-CG 6, and
optionally 32 Frank-Wolfe steps. Reports warm median + scipy-f64 quality
per config so the winner can become the automatic policy.
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

DECAY = ((1, 4), (4, 2), (10, 1))

CONFIGS = {
    "base": (dict(), dict()),
    "p3+late6": (dict(precond_refresh_period=3,
                      fiedler_warm_inner_iters=((10, 6),)), dict()),
    "p3+late6+s32": (dict(precond_refresh_period=3,
                          fiedler_warm_inner_iters=((10, 6),),
                          fiedler_warm_maxiter=DECAY,
                          fw_tail_average=True),
                     dict(max_iters=32, relative_duality_gap_tol=0.0)),
    "p3+s32": (dict(precond_refresh_period=3,
                    fiedler_warm_maxiter=DECAY,
                    fw_tail_average=True),
               dict(max_iters=32, relative_duality_gap_tol=0.0)),
    # Round-4 (TPU-measured): the p* cadence skips flipped quality hard
    # negative on real TPU (-2.4e-3 .. -5.6e-3) — dead. flat6 (now the
    # automatic default) measured 0.2280 s / +1.03e-3. Remaining lever:
    # fewer FW steps. "auto" = the current automatic policy as-is.
    "auto": (dict(), dict()),
    "auto+s32": (dict(fiedler_warm_maxiter=DECAY, fw_tail_average=True),
                 dict(max_iters=32, relative_duality_gap_tol=0.0)),
    "auto+s28": (dict(fiedler_warm_maxiter=DECAY, fw_tail_average=True),
                 dict(max_iters=28, relative_duality_gap_tol=0.0)),
    "auto+s24": (dict(fiedler_warm_maxiter=DECAY, fw_tail_average=True),
                 dict(max_iters=24, relative_duality_gap_tol=0.0)),
}


from mac_tpu.utils.fiedler import scipy_lam2  # shared quality referee


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        ctor_kw, solve_kw = CONFIGS[name]
        mac = MAC(fixed, cands, n, **ctor_kw)
        t0 = time.perf_counter()
        mac.solve(k, x_init, use_cache=True, **solve_kw)
        cold = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            rounded, x, u = mac.solve(k, x_init, use_cache=True, **solve_kw)
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
