"""Budget-sweep throughput: solve_sweep (one vmapped program, lanes
shardable over a mesh 'sweep' axis) vs the reference's serial per-budget
loop (examples/g2o_experiment.py:284-336 runs each budget as a separate
solve). Same inputs: city10000, budgets 10%..50% of the candidates.

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

    # --- sweep: one vmapped program over all lanes.
    t0 = time.perf_counter()
    mac.solve_sweep(ks)
    sweep_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rounded_sw, unrounded_sw, upper_sw = mac.solve_sweep(ks)
    sweep_warm = time.perf_counter() - t0

    # --- serial: the reference driver's shape — one solve per budget.
    # (Each solve at the automatic policy; warm timing after one cold pass.)
    x_inits = [None] * len(ks)
    for i, k in enumerate(ks):
        x = np.zeros(m)
        x[NaiveGreedy(cands).subset(int(k)).astype(bool)] = 1.0
        x_inits[i] = x
    mac.solve(int(ks[0]), x_inits[0], use_cache=True)  # compile
    t0 = time.perf_counter()
    serial_unrounded = []
    for k, x0 in zip(ks, x_inits):
        rounded, unrounded, upper = mac.solve(int(k), x0, use_cache=True)
        serial_unrounded.append(unrounded)
    serial_warm = time.perf_counter() - t0
    serial_lam = [float(mac.evaluate_objective(u)) for u in serial_unrounded]

    sweep_lam = [float(mac.evaluate_objective(unrounded_sw[i]))
                 for i in range(len(ks))]
    rec = dict(
        dataset=name, n=n, m_cand=m, ks=[int(k) for k in ks],
        sweep_cold_s=round(sweep_cold, 2), sweep_warm_s=round(sweep_warm, 3),
        serial_warm_s=round(serial_warm, 3),
        sweep_per_budget_s=round(sweep_warm / len(ks), 3),
        serial_per_budget_s=round(serial_warm / len(ks), 3),
        speedup_sweep_vs_serial=round(serial_warm / sweep_warm, 2),
        lam2_sweep=sweep_lam, lam2_serial=serial_lam,
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
