"""CPU quality screen: FW step count for the SMALL-graph banded-f32
policy (intel n=1728, sphere2500 n=2500) WITH the polish + guard tail
active. Round 3 set 64 steps because the bare FW tail closed the last
~5e-5 of relaxed objective; the round-4 polish climbs that tail exactly
(host f64), so fewer cheap steps may now be free speed.

CPU float32 banded = the same code path as TPU (quality only, time is
meaningless here). Referee: scipy eigsh f64.

Usage: python scripts/probe_r4_steps.py [steps ...]
"""

import sys
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

REF_ROUNDED = {
    "sphere2500": 0.0008836840861247152,
    "intel": 0.053701085768957976,
}
REF_RELAXED = {
    "sphere2500": 0.23430047503258467,
    "intel": 0.05372595512017725,
}


def main():
    steps_list = [int(s) for s in sys.argv[1:]] or [40, 48, 64]
    for name in ("intel", "sphere2500"):
        measurements, n = read_g2o_file(str(REPO / "data" / f"{name}.g2o"))
        fixed, cands = split_edges(rpm_to_mac(measurements))
        k = len(cands) // 2
        x_init = NaiveGreedy(cands).subset(k)
        mac = MAC(fixed, cands, n, dtype=jnp.float32, use_banded=True)
        # Replicate the AUTO policy pieces that an explicit max_iters
        # bypasses (warm-cap schedule, duality stop off, tail averaging).
        mac._warm_schedule = ((1, 4), (4, 2), (10, 1))
        mac._tail_average_user_set = True
        mac.fw_tail_average = True
        for steps in steps_list:
            rounded, x, u = mac.solve(
                k, x_init, use_cache=True, max_iters=steps,
                relative_duality_gap_tol=0.0)
            lam_r = scipy_lam2(mac.laplacian(np.asarray(rounded)))
            lam_x = scipy_lam2(mac.laplacian(np.asarray(x)))
            st = mac.last_solve_stats
            print(f"{name} s{steps}: relaxed rel "
                  f"{(lam_x - REF_RELAXED[name]) / REF_RELAXED[name]:+.2e} "
                  f"rounded rel "
                  f"{(lam_r - REF_ROUNDED[name]) / REF_ROUNDED[name]:+.2e} "
                  f"polished={st.get('polished')} evals={st.get('exact_evals')} "
                  f"guard={st.get('round_guard')}", flush=True)


if __name__ == "__main__":
    main()
