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
    t0 = time.perf_counter()
    Z = esp._compute_Z()
    t_z = time.perf_counter() - t0
    print(f"Z solves total: {t_z:.1f}s (Z {Z.nbytes/1e9:.2f} GB, "
          f"{Z.dtype}, chain_direct={esp._fixed_is_chain})", flush=True)

    t0 = time.perf_counter()
    results, sel, times = esp.subsets_lazy(ks)
    print(f"selection (native, cached Z): {time.perf_counter()-t0:.1f}s "
          f"cumulative={[round(t,1) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
