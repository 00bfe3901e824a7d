"""End-to-end pose-graph sparsification experiment (reference:
examples/g2o_experiment.py).

For a g2o dataset: parse, split odometry/loop closures, sweep candidate
budgets, solve with MAC (nearest + Madow re-rounding), NaiveGreedy, and
optionally lazy GreedyESP; report lambda2, dual gaps, and timings; and, if
PySESync is installed, solve the sparsified SLAM problems and report
ATE/RPE against the full solution. Plots are written when matplotlib is
available and --plot is passed.

Usage:
    python examples/g2o_experiment.py data/intel.g2o [--run-greedy] [--plot]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo checkout use

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy
from mac_tpu.solvers.greedy_esp import GreedyESP
from mac_tpu.utils.graphs import select_edges

# Optional downstream SLAM solver (external C++ dep, eval-quality only —
# reference guards this the same way, g2o_experiment.py:21).
try:
    import PySESync  # noqa: F401

    HAVE_SESYNC = True
except ImportError:
    HAVE_SESYNC = False


def sesync_solve(measurements, num_poses):
    """Solve the pose graph with SE-Sync; returns the xhat variable matrix."""
    import PySESync

    d = measurements[0].R.shape[0]
    sesync_measurements = []
    for m in measurements:
        meas = PySESync.RelativePoseMeasurement()
        meas.i = m.i
        meas.j = m.j
        meas.t = m.t
        meas.R = m.R
        meas.kappa = m.kappa
        meas.tau = m.tau
        sesync_measurements.append(meas)
    opts = PySESync.SESyncOpts()
    opts.num_threads = 4
    opts.verbose = False
    result = PySESync.SESync(sesync_measurements, opts)
    return np.asarray(result.xhat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="path to .g2o file")
    ap.add_argument("--run-greedy", action="store_true", help="also run lazy GreedyESP")
    ap.add_argument("--budgets", default="0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0")
    ap.add_argument("--max-iters", type=int, default=20)
    ap.add_argument("--madow-trials", type=int, default=1)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    t0 = time.perf_counter()
    measurements, n = read_g2o_file(args.dataset)
    print(f"parsed {args.dataset}: {len(measurements)} measurements, "
          f"{n} poses in {time.perf_counter() - t0:.2f}s")

    fixed_meas, lc_meas = split_edges(rpm_to_mac(measurements))
    meas_fixed, meas_lc = split_edges(measurements)
    print(f"odometry edges: {len(fixed_meas)}, loop closures: {len(lc_meas)}")

    budgets = [float(b) for b in args.budgets.split(",")]
    ks = sorted({max(1, int(b * len(lc_meas))) for b in budgets})

    mac = MAC(fixed_meas, lc_meas, n)
    naive = NaiveGreedy(lc_meas)

    records = []
    for k in ks:
        x_init = naive.subset(k)
        rec = dict(k=k, pct=k / len(lc_meas))

        t0 = time.perf_counter()
        rounded, unrounded, upper, rt = mac.solve(
            k, x_init, rounding="nearest", max_iters=args.max_iters,
            use_cache=True, return_rounding_time=True,
        )
        rec["mac_nearest_s"] = time.perf_counter() - t0
        rec["lam2_mac_nearest"] = mac.evaluate_objective(rounded)
        rec["lam2_unrounded"] = mac.evaluate_objective(unrounded)
        rec["dual_upper"] = upper
        rec["lam2_naive"] = mac.evaluate_objective(x_init)
        rec["mac_selection"] = rounded.tolist()
        rec["naive_selection"] = x_init.tolist()

        # Madow re-rounding of the same relaxed solution; timing bookkeeping
        # mirrors the reference (g2o_experiment.py:327-336): FW time +
        # re-rounding time.
        t0 = time.perf_counter()
        from mac_tpu.utils.rounding import round_madow
        import jax

        from mac_tpu.utils.rounding import round_madow_base

        key = jax.random.PRNGKey(0)
        if args.madow_trials > 1:
            import jax.numpy as jnp

            keys = jax.random.split(key, args.madow_trials)
            xs = jax.vmap(lambda kk: round_madow_base(unrounded, k, kk))(keys)
            vals = mac._eval_many_jit(mac._params, jnp.asarray(xs), mac._X0)
            madow = np.asarray(xs[int(np.argmax(np.asarray(vals)))])
        else:
            madow = np.asarray(round_madow_base(unrounded, k, key))
        rec["mac_madow_s"] = rec["mac_nearest_s"] - rt + (time.perf_counter() - t0)
        rec["lam2_mac_madow"] = mac.evaluate_objective(madow)
        rec["madow_selection"] = madow.tolist()

        print(
            f"k={k} ({rec['pct']:.0%}): naive={rec['lam2_naive']:.6g} "
            f"mac={rec['lam2_mac_nearest']:.6g} madow={rec['lam2_mac_madow']:.6g} "
            f"relaxed={rec['lam2_unrounded']:.6g} upper={upper:.6g} "
            f"[{rec['mac_nearest_s']:.2f}s]"
        )
        records.append(rec)

    if args.run_greedy:
        esp = GreedyESP(fixed_meas, lc_meas, n)
        t0 = time.perf_counter()
        results, _, times = esp.subsets_lazy(ks, verbose=False)
        for rec, mask, t in zip(records, results, times):
            rec["esp_s"] = t
            rec["lam2_esp"] = mac.evaluate_objective(mask)
            rec["esp_selection"] = mask.tolist()
            print(f"k={rec['k']}: esp={rec['lam2_esp']:.6g} [{t:.2f}s cumulative]")

    if HAVE_SESYNC:
        from mac_tpu.slam.metrics import poses_ate_tran, poses_rpe_rot

        xhat_full = sesync_solve(measurements, n)
        for rec in records:
            for name in ("mac", "madow", "naive", "esp"):
                sel_key = f"{name}_selection" if name != "mac" else "mac_selection"
                if sel_key not in rec:
                    continue
                mask = np.asarray(rec[sel_key])
                sel_meas = meas_fixed + select_edges(meas_lc, mask)
                xhat = sesync_solve(sel_meas, n)
                rec[f"ate_{name}"] = poses_ate_tran(xhat, xhat_full)
                rec[f"rpe_{name}"] = poses_rpe_rot(xhat, xhat_full)
    else:
        print("PySESync not installed: skipping downstream SLAM quality eval")

    if args.out:
        slim = [{k: v for k, v in r.items() if not k.endswith("_selection")}
                for r in records]
        Path(args.out).write_text(json.dumps(slim, indent=2))
        print(f"wrote {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pcts = [r["pct"] for r in records]
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        ax1.plot(pcts, [r["lam2_naive"] for r in records], "o-", label="Naive")
        ax1.plot(pcts, [r["lam2_mac_nearest"] for r in records], "s-", label="MAC (nearest)")
        ax1.plot(pcts, [r["lam2_mac_madow"] for r in records], "^-", label="MAC (madow)")
        if "lam2_esp" in records[0]:
            ax1.plot(pcts, [r["lam2_esp"] for r in records], "d-", label="GreedyESP")
        ax1.fill_between(pcts, [r["lam2_unrounded"] for r in records],
                         [r["dual_upper"] for r in records], alpha=0.2,
                         label="duality gap")
        ax1.set_xlabel("fraction of loop closures kept")
        ax1.set_ylabel(r"$\lambda_2(L)$")
        ax1.legend()
        ax2.semilogy(pcts, [r["mac_nearest_s"] for r in records], "s-", label="MAC")
        if "esp_s" in records[0]:
            ax2.semilogy(pcts, [r["esp_s"] for r in records], "d-", label="GreedyESP (cum.)")
        ax2.set_xlabel("fraction of loop closures kept")
        ax2.set_ylabel("solve time (s)")
        ax2.legend()
        stem = Path(args.dataset).stem
        fig.savefig(f"{stem}_experiment.png", dpi=120, bbox_inches="tight")
        print(f"wrote {stem}_experiment.png")


if __name__ == "__main__":
    main()
