"""Round-3: dissect the f64 in-process-CPU path on the datasets that lose
to the reference (kitti_02, kitti_05, ais2klinik — VERDICT r2 weak #2).

Runs several eigensolver configs per dataset, printing warm time, FW/outer
counts, and the relaxed-objective gap vs the reference optimum.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")  # the instance device pin target

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402

REF = {
    "kitti_05": (18.887283604529912, 0.049),
    "kitti_02": (2.3255991498563375, 0.018),
    "ais2klinik": (5.295801683341e-05, 0.123),
}


def run(name, fixed, cands, n, k, x_init, label, **kw):
    mac = MAC(fixed, cands, n, dtype=jnp.float64, **kw)
    t0 = time.perf_counter()
    mac.solve(k, x_init, max_iters=20)
    cold = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, max_iters=20)
        times.append(time.perf_counter() - t0)
    lam = mac.evaluate_objective(x)
    ref_lam, ref_t = REF[name]
    gap = (lam - ref_lam) / ref_lam
    st = mac.last_solve_stats
    print(f"{name} [{label}]: warm={min(times):.4f}s ref={ref_t}s "
          f"speedup={ref_t / min(times):.2f} gap={gap:+.2e} "
          f"fw={st['fw_iterations']} outers={st['fiedler_iterations']} "
          f"cold={cold:.1f}s", flush=True)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name in ("kitti_02", "kitti_05", "ais2klinik"):
        if only and name != only:
            continue
        measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
        fixed, cands = split_edges(rpm_to_mac(measurements))
        k = len(cands) // 2
        x_init = NaiveGreedy(cands).subset(k)
        run(name, fixed, cands, n, k, x_init, "default")
        run(name, fixed, cands, n, k, x_init, "cap5",
            fiedler_warm_maxiter=5)
        run(name, fixed, cands, n, k, x_init, "cap3+inner8",
            fiedler_warm_maxiter=3, fiedler_inner_iters=8)
        run(name, fixed, cands, n, k, x_init, "cap2+inner8",
            fiedler_warm_maxiter=2, fiedler_inner_iters=8)


if __name__ == "__main__":
    main()
