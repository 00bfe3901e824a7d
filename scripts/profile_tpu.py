"""TPU profiling sweep for the Fiedler solve + full MAC solve on city10000.

Measures, per configuration (inner_iters, q, precond variant):
  cold/warm fiedler time, outer iterations, residual floor, lambda_2
  accuracy vs the f64 CPU value, and full-solve time.

Usage: python scripts/profile_tpu.py [quick]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import MAC, NaiveGreedy
from mac_tpu.utils import fiedler as _fiedler
from mac_tpu.utils.graphs import edges_to_arrays

F64_LAM2_ONES = None  # filled from CPU reference value passed on cmdline


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)

    fixed_idx, w_fixed = edges_to_arrays(fixed)
    cand_idx, w_cand = edges_to_arrays(cands)

    # Reference value for lambda_2(L(x_init)) computed with scipy (f64).
    import scipy.sparse.linalg as spla
    from mac_tpu.utils.graphs import weight_graph_lap_from_edges

    all_idx = np.concatenate([fixed_idx, cand_idx])
    w_all_np = np.concatenate([w_fixed, x_init * w_cand])
    L = weight_graph_lap_from_edges(all_idx, w_all_np, n)
    t0 = time.perf_counter()
    vals = spla.eigsh(L, k=2, sigma=-1e-4, which="LM", return_eigenvectors=False)
    lam_true = float(np.sort(vals)[-1])
    print(f"scipy f64 lambda2(x_init) = {lam_true:.12g}  [{time.perf_counter()-t0:.1f}s]",
          flush=True)

    from mac_tpu.ops.laplacian import build_operator

    op = build_operator(all_idx, n)
    print("op mode:", op.mode, "dmax:", op.eid_tbl.shape[1], flush=True)

    dtype = jnp.float32
    w_all = jnp.asarray(w_all_np, dtype)

    for q in (4, 8):
        for inner in (8, 16):
            X0 = jnp.asarray(_fiedler.default_block(n, q), dtype)
            f = jax.jit(
                lambda w, X, inner=inner: _fiedler.fiedler_pair_op(
                    op, w, X, tol=1e-8, maxiter=200, inner_iters=inner
                )
            )
            t0 = time.perf_counter()
            res = jax.block_until_ready(f(w_all, X0))
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = jax.block_until_ready(f(w_all, X0))
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            res2 = jax.block_until_ready(f(w_all, res.X))
            rewarm = time.perf_counter() - t0
            # f64 Rayleigh refinement on host.
            v = np.asarray(res.X[:, 0], dtype=np.float64)
            lam_refined = float(v @ (L @ v) / (v @ v))
            print(
                f"q={q} inner={inner}: cold={cold:.1f}s warm={warm*1000:.0f}ms "
                f"(iters={int(res.iters)}, res={float(res.res):.2e}) "
                f"restart={rewarm*1000:.0f}ms (iters={int(res2.iters)}) "
                f"lam={float(res.lam[0]):.8g} refined={lam_refined:.10g} "
                f"relerr={abs(lam_refined-lam_true)/lam_true:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
