"""Profile GreedyESP phases on city10000 (budgets 10/30/50%): Gram solve
time, Gram gather, native lazy selection."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers.greedy_esp import GreedyESP


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    m = len(cands)
    ks = [int(0.1 * m), int(0.3 * m), int(0.5 * m)]

    esp = GreedyESP(fixed, cands, n)
    print(f"chain closed-form: {esp._fixed_is_chain}", flush=True)
    t0 = time.perf_counter()
    results, sel, times = esp.subsets_lazy(ks)
    print(f"subsets_lazy end-to-end: {time.perf_counter()-t0:.2f}s "
          f"cumulative={[round(t,2) for t in times]}", flush=True)

    if not esp._fixed_is_chain:
        t0 = time.perf_counter()
        Z = esp._compute_Z()
        print(f"Z solves: {time.perf_counter()-t0:.1f}s "
              f"(Z {Z.nbytes/1e9:.2f} GB {Z.dtype})", flush=True)


if __name__ == "__main__":
    main()
