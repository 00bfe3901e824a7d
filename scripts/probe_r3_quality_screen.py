"""Round-3 CPU quality screen: cadence-skip + inner-CG schedule on the
fast32 banded path (forced dtype=float32, the same code path the TPU
runs) for sphere2500/intel. CPU wall-times are meaningless here; the
OUTPUT of interest is the relaxed-objective gap and outer counts — a
config that loses quality on these graphs is not worth TPU time.

Usage: python scripts/probe_r3_quality_screen.py [dataset ...]
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

REF = {
    "sphere2500": 0.2343004750,
    "intel": 0.0537259551,
    "city10000": 0.06944591018149751,
}

CONFIGS = [
    ("base", {}),
    ("p2", {"precond_refresh_period": 2}),
    ("p3", {"precond_refresh_period": 3}),
    ("p3+late6", {"precond_refresh_period": 3,
                  "fiedler_warm_inner_iters": ((10, 6),)}),
    ("late6", {"fiedler_warm_inner_iters": ((10, 6),)}),
    ("late4", {"fiedler_warm_inner_iters": ((10, 4),)}),
]


from mac_tpu.utils.fiedler import scipy_lam2  # shared quality referee


def main():
    names = sys.argv[1:] or ["sphere2500", "intel"]
    for name in names:
        measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
        fixed, cands = split_edges(rpm_to_mac(measurements))
        k = len(cands) // 2
        x_init = NaiveGreedy(cands).subset(k)
        for label, kw in CONFIGS:
            mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True,
                      **kw)
            t0 = time.perf_counter()
            rounded, x, u = mac.solve(k, x_init, use_cache=True)
            t = time.perf_counter() - t0
            lam = scipy_lam2(mac.laplacian(np.asarray(x)))
            st = mac.last_solve_stats
            print(f"{name} [{label}]: gap={(lam - REF[name]) / REF[name]:+.2e} "
                  f"fw={st['fw_iterations']} outers={st['fiedler_iterations']} "
                  f"(cpu t={t:.1f}s incl compile)", flush=True)


if __name__ == "__main__":
    main()
