"""Round-3 config sweep on city10000 (TPU): warm-cap schedules x inner
iterations. Reports warm solve time, f64-refined lambda_2, and cumulative
eigensolver outers per config.

Usage: python scripts/probe_r3_sched.py [config_set]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax.numpy as jnp

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy

REF_LAM2 = 0.06944591018149751  # reference relaxed optimum (BASELINE.md)


def run_config(fixed, cands, n, k, x_init, name, mi=20, **kw):
    mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True, **kw)
    # Cold (compile) run.
    t0 = time.perf_counter()
    _, x, _ = mac.solve(k, x_init, max_iters=mi)
    cold = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, max_iters=mi)
        times.append(time.perf_counter() - t0)
    lam = mac.evaluate_objective(x)
    gap = (lam - REF_LAM2) / REF_LAM2
    st = mac.last_solve_stats
    print(f"{name}: warm={min(times):.4f}s (runs {['%.3f' % t for t in times]}) "
          f"lam2={lam:.8f} gap={gap:+.2e} "
          f"fw={st['fw_iterations']} outers={st['fiedler_iterations']} "
          f"cold={cold:.1f}s", flush=True)
    return min(times), gap


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    which = sys.argv[1] if len(sys.argv) > 1 else "sched"

    if which == "steps":
        # Per-FW-step outer profile: diff cumulative outers across maxiter.
        mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True)
        prev = 0
        for mi in (1, 2, 3, 5, 8, 12, 16, 20):
            mac.solve(k, x_init, max_iters=mi)
            st = mac.last_solve_stats
            tot = st["fiedler_iterations"]
            print(f"maxiter={mi}: fw={st['fw_iterations']} outers={tot} "
                  f"(delta {tot - prev})", flush=True)
            prev = tot
        return

    configs = [
        ("base flat5", dict()),
        ("flat4", dict(fiedler_warm_maxiter=4)),
        ("flat3", dict(fiedler_warm_maxiter=3)),
        ("5->3@8", dict(fiedler_warm_maxiter=((1, 5), (8, 3)))),
        ("5->2@10", dict(fiedler_warm_maxiter=((1, 5), (10, 2)))),
        ("5->3@6->2@12", dict(fiedler_warm_maxiter=((1, 5), (6, 3), (12, 2)))),
        ("inner8 flat5", dict(fiedler_inner_iters=8)),
        ("inner8 5->3@8", dict(fiedler_inner_iters=8,
                               fiedler_warm_maxiter=((1, 5), (8, 3)))),
        ("inner12 flat4", dict(fiedler_inner_iters=12,
                               fiedler_warm_maxiter=4)),
    ]
    for name, kw in configs:
        run_config(fixed, cands, n, k, x_init, name, **kw)


if __name__ == "__main__":
    main()
