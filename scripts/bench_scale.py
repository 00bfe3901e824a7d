"""Scalability benchmark: synthetic pose graphs beyond the bundled dataset
sizes (chain + random loop closures), mac_tpu on TPU vs the reference
implementation (scipy/NetworkX tracemin_lu) on CPU, identical inputs.

Usage: python scripts/bench_scale.py [n ...]    (default: 30000 100000)
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, "/root/reference")

import numpy as np


def synthetic(n, seed=0, local=False):
    """Chain + random loop closures. local=False: spans up to n/4 (an
    expander-like regime with no narrow band -> the ELL path). local=True:
    spans <= 290 (spatially local revisits, the typical SLAM regime ->
    RCM gives a narrow band and the block-banded MXU path engages)."""
    rng = np.random.RandomState(seed)
    fixed_idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1).astype(np.int32)
    w_fixed = 0.5 + rng.rand(n - 1)
    m_loops = n // 2
    if local:
        lo = rng.randint(0, n - 300, m_loops)
        cand_idx = np.stack(
            [lo, lo + 2 + rng.randint(0, 290, m_loops)], 1).astype(np.int32)
        w_cand = 0.5 + rng.rand(m_loops)
        return fixed_idx, w_fixed, cand_idx, w_cand
    lo = rng.randint(0, n - 3, 2 * m_loops)
    span = rng.randint(2, n // 4, 2 * m_loops)
    hi = lo + span
    keep = hi <= n - 1  # reject (don't clamp: clamping concentrates degree)
    cand_idx = np.stack([lo[keep], hi[keep]], 1)[:m_loops].astype(np.int32)
    w_cand = 0.5 + rng.rand(len(cand_idx))
    return fixed_idx, w_fixed, cand_idx, w_cand


def run_ours(fixed_idx, w_fixed, cand_idx, w_cand, n, k, max_iters):
    from mac_tpu.solvers import MAC

    mac = MAC((fixed_idx, w_fixed), (cand_idx, w_cand), n,
              fiedler_inner_iters=10, fiedler_maxiter=60, fiedler_tol=6e-4)
    m = len(w_cand)
    x_init = np.zeros(m)
    x_init[np.argpartition(w_cand, -k)[-k:]] = 1.0
    t0 = time.perf_counter()
    mac.solve(k, x_init, max_iters=max_iters, use_cache=True)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rounded, unrounded, upper = mac.solve(k, x_init, max_iters=max_iters, use_cache=True)
    warm = time.perf_counter() - t0
    lam = mac.evaluate_objective(unrounded)
    return dict(impl="mac_tpu", dtype=str(np.dtype(mac.dtype)), cold_s=round(cold, 2),
                warm_s=round(warm, 3), lam2_unrounded=lam, upper=float(upper))


def run_reference(fixed_idx, w_fixed, cand_idx, w_cand, n, k, max_iters):
    from mac.solvers import MAC as RefMAC
    from mac.utils.graphs import Edge

    fixed = [Edge(int(i), int(j), float(w)) for (i, j), w in zip(fixed_idx, w_fixed)]
    cands = [Edge(int(i), int(j), float(w)) for (i, j), w in zip(cand_idx, w_cand)]
    mac = RefMAC(fixed, cands, n)
    m = len(w_cand)
    x_init = np.zeros(m)
    x_init[np.argpartition(w_cand, -k)[-k:]] = 1.0
    t0 = time.perf_counter()
    rounded, unrounded, upper = mac.solve(k, x_init, max_iters=max_iters, use_cache=True)
    solve_s = time.perf_counter() - t0
    lam = mac.evaluate_objective(unrounded)
    return dict(impl="reference", solve_s=round(solve_s, 3),
                lam2_unrounded=float(lam), upper=float(upper))


def main():
    args = [a for a in sys.argv[1:]]
    ours_only = "--ours-only" in args
    ref_only = "--ref-only" in args
    local = "--local" in args  # banded-compatible local-loop topology
    # Second, reference-quality-MATCHED operating point (r3 VERDICT item
    # 3): the reference's absolute grad-norm stop halts it after ~4
    # effective steps on tiny-lambda2 local graphs, so "--match-iters 4"
    # records ours at the same effort level alongside the full-quality
    # 10-step point.
    match_iters = None
    for a in args:
        if a.startswith("--match-iters="):
            match_iters = int(a.split("=", 1)[1])
    ns = [int(v) for v in args if not v.startswith("--")] or [30000, 100000]
    max_iters = 10
    out = []
    for n in ns:
        fixed_idx, w_fixed, cand_idx, w_cand = synthetic(n, local=local)
        k = len(w_cand) // 4
        print(f"=== n={n} m_cand={len(w_cand)} k={k} local={local} ===",
              flush=True)
        rec = dict(n=n, m_cand=len(w_cand), k=k)
        if local:
            rec["topology"] = "local"
        if not ref_only:
            ours = run_ours(fixed_idx, w_fixed, cand_idx, w_cand, n, k, max_iters)
            print(json.dumps(dict(n=n, **ours)), flush=True)
            rec.update(tpu_warm_s=ours["warm_s"],
                       tpu_lam2=ours["lam2_unrounded"])
            if match_iters is not None:
                oq = run_ours(fixed_idx, w_fixed, cand_idx, w_cand, n, k,
                              match_iters)
                print(json.dumps(dict(n=n, point=f"match{match_iters}",
                                      **oq)), flush=True)
                rec.update(tpu_matched_s=oq["warm_s"],
                           tpu_matched_lam2=oq["lam2_unrounded"],
                           matched_iters=match_iters)
        if not ours_only:
            ref = run_reference(fixed_idx, w_fixed, cand_idx, w_cand, n, k, max_iters)
            print(json.dumps(dict(n=n, **ref)), flush=True)
            rec.update(ref_s=ref["solve_s"], ref_lam2=ref["lam2_unrounded"])
        if not ref_only and not ours_only:
            rec["speedup"] = round(ref["solve_s"] / ours["warm_s"], 2)
            rec["quality_gap_rel"] = (
                (ours["lam2_unrounded"] - ref["lam2_unrounded"])
                / ref["lam2_unrounded"])
        print(json.dumps(rec), flush=True)
        out.append(rec)
    # MERGE into the existing record (single-sided runs fill their half):
    # a plain overwrite erased previously measured points.
    path = REPO / "scripts" / "bench_scale_results.json"
    def key(r):
        # Local-loop (banded) and expander (ELL) topologies are separate
        # scaling series; merging by n alone would cross-contaminate.
        return (r["n"], r.get("topology", "expander"))

    try:
        prev = {key(r): r for r in json.loads(path.read_text())}
    except Exception:
        prev = {}
    for rec in out:
        merged = prev.get(key(rec), {})
        merged.update(rec)
        if "ref_s" in merged and "tpu_warm_s" in merged:
            merged["speedup"] = round(merged["ref_s"] / merged["tpu_warm_s"], 2)
            if "ref_lam2" in merged and "tpu_lam2" in merged:
                merged["quality_gap_rel"] = (
                    (merged["tpu_lam2"] - merged["ref_lam2"])
                    / merged["ref_lam2"])
        if "ref_s" in merged and "tpu_matched_s" in merged:
            merged["speedup_matched"] = round(
                merged["ref_s"] / merged["tpu_matched_s"], 2)
            if "ref_lam2" in merged and "tpu_matched_lam2" in merged:
                merged["matched_gap_rel"] = (
                    (merged["tpu_matched_lam2"] - merged["ref_lam2"])
                    / merged["ref_lam2"])
        prev[key(rec)] = merged
    path.write_text(json.dumps(
        [prev[nn] for nn in sorted(prev)], indent=2))
    print("wrote scripts/bench_scale_results.json", flush=True)


if __name__ == "__main__":
    main()
