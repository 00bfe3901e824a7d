"""Validate the round-5 small-instance host routing on a REAL TPU session.

intel (n=1728, K=50%) is the only bench_all dataset inside the
SMALL_HOST_N=2000 gate: with the gate, MAC() auto-escalates it to f64 +
the host splu engine (solvers/mac.py SMALL_HOST_N) instead of the banded
f32 device path, trading the ~0.2 s device dispatch floor for an exact
host solve. CPU-session screen measured host 0.128 s / relaxed -2.8e-11;
the banded-f32 row was 0.22 s / -1.1e-5 (bench_all r5). This probe runs
the REAL configuration (TPU session, auto policy) and reports warm
median + quality so the routing decision is validated where it ships.

Usage: python scripts/probe_r5_intel_host.py
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

REF_RELAXED = 0.05372595512017725
REF_ROUNDED = 0.053701085768957976
REF_SOLVE_S = 0.416


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "intel.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    mac = MAC(fixed, cands, n)  # auto policy — must route host now
    print(f"backend={mac.fiedler_backend} dtype={mac.dtype} "
          f"small_host={mac._small_host} reason={mac.auto_dtype_reason}",
          flush=True)
    t0 = time.perf_counter()
    mac.solve(k, x_init, use_cache=True)
    cold = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, use_cache=True)
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    lam = scipy_lam2(mac.laplacian(np.asarray(x)))
    lamr = scipy_lam2(mac.laplacian(np.asarray(rounded)))
    print(f"intel auto (host): cold {cold:.3f}s warm median {med:.4f}s "
          f"({REF_SOLVE_S/med:.2f}x) relaxed rel "
          f"{(lam-REF_RELAXED)/REF_RELAXED:+.2e} rounded {lamr:.6f} "
          f"(ref {REF_ROUNDED:.6f}) stats={mac.last_solve_stats}",
          flush=True)


if __name__ == "__main__":
    main()
