"""Round-4 TPU A/B batch (single process, serialized on the one chip):

1. Tail probe after the Woodbury guard rework: intel + sphere2500 phase
   breakdown (device FW / polish / guard, exact-eval counts).
2. city10000 preconditioner kind A/B: multiplicative V-cycle (default)
   vs additive two-level. The additive cycle removes 4 of 6 permutation
   gathers and 2 residual applies per PCG iteration — the trace showed
   ~17 ms of layout copies riding the smoother's pallas-call boundary
   per solve — at the cost of a weaker preconditioner (more outers).

Usage: python scripts/probe_r4_ab.py
"""

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import mac_tpu.ops.banded as banded_mod
from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy
from mac_tpu.utils.fiedler import scipy_lam2

REF = {r["dataset"]: r for r in json.loads(
    (REPO / "scripts" / "baseline_reference.json").read_text())}


def load(name):
    measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    return fixed, cands, n, k, x_init


def tail_probe(name):
    fixed, cands, n, k, x_init = load(name)
    mac = MAC(fixed, cands, n)
    mac.solve(k, x_init, use_cache=True)
    times, stats = [], None
    for _ in range(3):
        t0 = time.perf_counter()
        rounded, unrounded, upper = mac.solve(k, x_init, use_cache=True)
        times.append(time.perf_counter() - t0)
        stats = dict(mac.last_solve_stats)
    lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
    ref = REF[name]
    print(json.dumps(dict(
        probe="tail", dataset=name, total_s=round(statistics.median(times), 4),
        fw_time_s=round(stats.get("fw_time_s", 0.0), 4),
        polish_time_s=round(stats.get("polish_time_s", 0.0), 4),
        guard_time_s=round(stats.get("guard_time_s", 0.0), 4),
        exact_evals=stats.get("exact_evals"),
        lam2_rounded=lam_r, ref_lam2_rounded=ref["lam2_rounded"],
        rounded_rel=(lam_r - ref["lam2_rounded"]) / abs(ref["lam2_rounded"]),
        speedup=round(ref["solve_s"] / statistics.median(times), 2))),
        flush=True)


def precond_ab():
    fixed, cands, n, k, x_init = load("city10000")
    ref = REF["city10000"]
    for kind in ("mult", "additive"):
        banded_mod.PRECOND_KIND = kind
        mac = MAC(fixed, cands, n)
        mac.solve(k, x_init, use_cache=True)
        times, stats = [], None
        for _ in range(5):
            t0 = time.perf_counter()
            rounded, unrounded, upper = mac.solve(k, x_init, use_cache=True)
            times.append(time.perf_counter() - t0)
            stats = dict(mac.last_solve_stats)
        med = statistics.median(times)
        lam_u = scipy_lam2(mac.laplacian(np.asarray(unrounded)))
        print(json.dumps(dict(
            probe="precond", kind=kind, total_s=round(med, 4),
            fw_iters=stats.get("fw_iterations"),
            fiedler_iters=stats.get("fiedler_iterations"),
            lam2_rel=(lam_u - ref["lam2_unrounded"])
            / abs(ref["lam2_unrounded"]),
            speedup=round(ref["solve_s"] / med, 2))), flush=True)
    banded_mod.PRECOND_KIND = "mult"


if __name__ == "__main__":
    for name in ("intel", "sphere2500"):
        tail_probe(name)
    precond_ab()
