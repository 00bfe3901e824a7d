"""Round-5 polish-schedule screen (CPU f32 banded = the TPU quality code
path; wall time meaningless EXCEPT polish_time_s, which is host work and
runs on this same core in a real TPU session).

Goal (round-4 verdict #4): intel relaxed gap >= 0 vs the reference's
canonical optimum at minimal extra host eigensolves. Sphere2500 sanity.

Usage: python scripts/probe_r5_polish.py [dataset ...]
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

REF = {
    "sphere2500": 0.2343004750,
    "intel": 0.0537259551,
    "city10000": 0.06944591018149751,
}

# (label, fw_polish_rounds, fw_polish_target)
CONFIGS = [
    ("r4 (1, 5e-5)", 1, 5e-5),
    ("(6, 5e-6)", 6, 5e-6),
    ("default (8, 5e-6)", 8, 5e-6),
    ("(10, 2e-6)", 10, 2e-6),
]


def main():
    names = sys.argv[1:] or ["intel", "sphere2500"]
    for name in names:
        measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
        fixed, cands = split_edges(rpm_to_mac(measurements))
        k = len(cands) // 2
        x_init = NaiveGreedy(cands).subset(k)
        for label, rounds, target in CONFIGS:
            mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True)
            mac.fw_polish_rounds = rounds
            mac.fw_polish_target = target
            t0 = time.perf_counter()
            rounded, x, u = mac.solve(k, x_init, use_cache=True)
            t = time.perf_counter() - t0
            lam = scipy_lam2(mac.laplacian(np.asarray(x)))
            lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
            st = mac.last_solve_stats
            print(
                f"{name} [{label}]: relaxed gap="
                f"{(lam - REF[name]) / REF[name]:+.2e} "
                f"rounded={lam_r:.6g} evals={mac._exact_evals} "
                f"polish={st.get('polish_time_s', 0.0) * 1e3:.0f}ms "
                f"guard={st.get('round_guard_time_s', 0.0) * 1e3:.0f}ms "
                f"(cpu t={t:.1f}s incl compile)", flush=True)


if __name__ == "__main__":
    main()
