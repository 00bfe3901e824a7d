"""Round-4 CPU screen for the rounded-quality guard + bounded fw_polish
(verdict r3 items 4/5): forced-banded float32 (the TPU code path) on
sphere2500/intel, reporting the ROUNDED lambda2 against the reference's
recorded rounded values, plus guard/polish stats and wall time of the
host-side tail (polish + guard) in isolation.

Usage: python scripts/probe_r4_roundguard.py [dataset ...]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

# Reference rounded/relaxed lambda2 (scipy eigsh f64 referee), from
# scripts/bench_all_results.json (reference columns are current).
REF_ROUNDED = {
    "sphere2500": 0.0008836840861247152,
    "intel": 0.053701085768957976,
    "city10000": 0.06499201996007087,
}
REF_RELAXED = {
    "sphere2500": 0.23430047503258467,
    "intel": 0.05372595512017725,
    "city10000": 0.06944591018149751,
}


def main():
    names = sys.argv[1:] or ["sphere2500", "intel"]
    for name in names:
        measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
        fixed, cands = split_edges(rpm_to_mac(measurements))
        k = len(cands) // 2
        x_init = NaiveGreedy(cands).subset(k)
        mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True)
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, use_cache=True)
        t = time.perf_counter() - t0
        lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
        lam_x = scipy_lam2(mac.laplacian(np.asarray(x)))
        st = mac.last_solve_stats
        print(f"{name}: rounded lam2 {lam_r:.10f} "
              f"(ref {REF_ROUNDED[name]:.10f}, "
              f"rel {(lam_r - REF_ROUNDED[name]) / REF_ROUNDED[name]:+.2e}) "
              f"relaxed {lam_x:.10f} "
              f"(rel {(lam_x - REF_RELAXED[name]) / REF_RELAXED[name]:+.2e})",
              flush=True)
        print(f"  stats: polished={st.get('polished')} "
              f"round_guard={st.get('round_guard')} "
              f"fw_iters={st['fw_iterations']} solve_s={t:.2f}", flush=True)

        # Host-tail timing in isolation (polish + guard on a warm solve):
        t0 = time.perf_counter()
        rounded2, x2, u2 = mac.solve(k, x_init, use_cache=True)
        t_warm = time.perf_counter() - t0
        mac.fw_polish = False
        mac.round_guard = False
        t0 = time.perf_counter()
        mac.solve(k, x_init, use_cache=True)
        t_bare = time.perf_counter() - t0
        print(f"  warm solve {t_warm:.3f}s; without polish+guard "
              f"{t_bare:.3f}s -> host tail ~{t_warm - t_bare:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
