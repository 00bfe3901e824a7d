"""TPU A/B: chain-smoother solve via Pallas kernel vs associative scan.

The round-5 trace (profile_trace.py, /tmp/trace_city.log) attributes
~47 us/inner-CG-iteration to 12 XLA `copy` ops that bracket the two
tridiag_solve_fused Pallas custom calls — XLA cannot propagate layouts
through a custom call, so every iteration pays layout round-trips worth
~10x the kernels' own compute (2 x 4.9 us). The associative-scan path is
slower AS MATH (~30 fused scan stages) but lives inside XLA's fusion
world: if its total cost undercuts kernel+copies, the scan wins NET and
the dispatch default should flip for this shape.

Runs ONE arm per process (the solve program is jit-cached per instance
but the flag is read at trace time — a fresh process guarantees a clean
cache): `python scripts/probe_r5_scansolve.py pallas|scan`.
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from mac_tpu.ops import tridiag  # noqa: E402
from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

REF_RELAXED = 0.06944591018149751
REF_SOLVE_S = 1.931


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    tridiag.FORCE_SCAN = arm == "scan"

    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    mac = MAC(fixed, cands, n)
    mac.solve(k, x_init, use_cache=True)  # compile + warm
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        rounded, x, u = mac.solve(k, x_init, use_cache=True)
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    lam = scipy_lam2(mac.laplacian(np.asarray(x)))
    print(f"{arm}: median {med:.4f}s ({REF_SOLVE_S/med:.2f}x) "
          f"min {min(ts):.4f} relaxed rel "
          f"{(lam-REF_RELAXED)/REF_RELAXED:+.2e} "
          f"stats={mac.last_solve_stats}", flush=True)


if __name__ == "__main__":
    main()
