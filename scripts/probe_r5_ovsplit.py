"""TPU A/B: assembly overflow split (du_dense + in-kernel SMEM tail) vs
the all-slots fused kernel, INTERLEAVED reps (tunnel drift ~±15% swamps
back-to-back probes — probe_r5_ab56.py protocol).

city10000: du=8 with slot occupancy [9999, 6444, 3012, 958, 217, 48, 8,
1] splits at du_dense=5 / ov_rows=5, dropping 3 of 8 weight-gather rows
(~72 us each per FW step, fusion.1624 = 577 us at du=8) for ~5 in-kernel
one-hot passes (~0.2 us/block). The round-5 XLA scatter variant of this
same idea LOST end-to-end (broke fusion with the degree reduction,
probe_r5_gather.py) — this is the "fuse the overflow into the assembly
program itself" retry the negative result prescribed.

Both arms in one process: the split is decided host-side at table-build
time (banded.OV_CAP), so each arm gets its own MAC instance and jit
cache entry (different static du_dense/ov_rows → different programs).

Usage: python scripts/probe_r5_ovsplit.py
"""

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from mac_tpu.ops import banded  # noqa: E402
from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges  # noqa: E402
from mac_tpu.solvers import MAC, NaiveGreedy  # noqa: E402
from mac_tpu.utils.fiedler import scipy_lam2  # noqa: E402

REF_RELAXED = 0.06944591018149751
REF_SOLVE_S = 1.931
REPS = 15


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    arms = {}
    for name, cap in (("split", banded.OV_CAP), ("nosplit", -1)):
        banded.OV_CAP = cap
        mac = MAC(fixed, cands, n)
        bop = mac._banded
        print(f"{name}: du_dense={bop.du_dense} ov_rows={bop.ov_rows}",
              flush=True)
        mac.solve(k, x_init, use_cache=True)  # compile + warm
        arms[name] = (mac, [])

    for rep in range(REPS):
        for name, (mac, times) in arms.items():
            t0 = time.perf_counter()
            mac.solve(k, x_init, use_cache=True)
            times.append(time.perf_counter() - t0)

    for name, (mac, times) in arms.items():
        ts = sorted(times)
        med = statistics.median(ts)
        q1, q3 = ts[len(ts) // 4], ts[3 * len(ts) // 4]
        _, x, _ = mac.solve(k, x_init, use_cache=True)
        lam = scipy_lam2(mac.laplacian(np.asarray(x)))
        print(f"{name}: median {med:.4f}s ({REF_SOLVE_S/med:.2f}x) "
              f"IQR [{q1:.4f}, {q3:.4f}] min {ts[0]:.4f} relaxed rel "
              f"{(lam-REF_RELAXED)/REF_RELAXED:+.2e}", flush=True)


if __name__ == "__main__":
    main()
