"""Measure the reference (scipy/NetworkX) MAC implementation on the bundled
datasets, producing the BASELINE.md numbers. Run on CPU:

    python scripts/measure_baseline.py [dataset ...]

Protocol (mirrors examples/g2o_experiment.py of the reference):
  k = 50% of loop closures, x_init = NaiveGreedy top-k, max_iters=20,
  nearest rounding, fiedler_method='tracemin_lu' (the reference default;
  CHOLMOD is unavailable in this image, as on any box without SuiteSparse).
"""

import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, "/root/reference")  # reference implementation (read-only)

import jax

jax.config.update("jax_platforms", "cpu")  # our parser pulls in mac_tpu/jax

import numpy as np

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "data"


def run_dataset(name: str, budget_frac: float = 0.5, max_iters: int = 20):
    from mac.solvers import MAC, NaiveGreedy

    # The reference's examples/pose_graph_utils.py imports `evo` at module
    # level (unavailable here); our parser produces identical Edge weights
    # (same kappa/tau conventions), so use it to feed the reference solver.
    from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges

    t0 = time.perf_counter()
    measurements, num_poses = read_g2o_file(str(DATA / f"{name}.g2o"))
    parse_s = time.perf_counter() - t0

    fixed_meas, lc_meas = split_edges(measurements)
    fixed = rpm_to_mac(fixed_meas)
    cands = rpm_to_mac(lc_meas)
    k = int(budget_frac * len(cands))

    naive = NaiveGreedy(cands)
    x_init = naive.subset(k)

    mac = MAC(fixed, cands, num_poses)

    t0 = time.perf_counter()
    rounded, unrounded, upper = mac.solve(
        k, x_init, rounding="nearest", max_iters=max_iters, use_cache=True
    )
    solve_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    lam2_rounded = mac.evaluate_objective(rounded)
    eval_s = time.perf_counter() - t0
    lam2_unrounded = mac.evaluate_objective(unrounded)
    lam2_init = mac.evaluate_objective(x_init)

    return dict(
        dataset=name,
        n=num_poses,
        m_fixed=len(fixed),
        m_cand=len(cands),
        k=k,
        parse_s=round(parse_s, 3),
        solve_s=round(solve_s, 3),
        eval_s=round(eval_s, 3),
        lam2_rounded=lam2_rounded,
        lam2_unrounded=lam2_unrounded,
        lam2_init=lam2_init,
        upper=upper,
        max_iters=max_iters,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["intel", "kitti_05", "kitti_02", "sphere2500", "city10000", "ais2klinik"]
    results = []
    for name in names:
        print(f"=== {name} ===", flush=True)
        r = run_dataset(name)
        print(json.dumps(r), flush=True)
        results.append(r)
    out = REPO / "scripts" / "baseline_reference.json"
    existing = []
    if out.exists():
        existing = json.loads(out.read_text())
        existing = [e for e in existing if e["dataset"] not in {r["dataset"] for r in results}]
    out.write_text(json.dumps(existing + results, indent=2))
    print(f"wrote {out}")
