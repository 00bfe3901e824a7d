"""Does f32 TRACEMIN keep converging if we disable stall detection?"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import NaiveGreedy
from mac_tpu.utils import fiedler as _fiedler
from mac_tpu.utils.graphs import edges_to_arrays, weight_graph_lap_from_edges
from mac_tpu.ops.laplacian import build_operator, lap_apply, lap_inf_norm, lap_tridiagonal_part
from mac_tpu.ops.lobpcg import tracemin_fiedler
from mac_tpu.ops.tridiag import tridiag_ldl, tridiag_solve_factored


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fixed_idx, w_fixed = edges_to_arrays(fixed)
    cand_idx, w_cand = edges_to_arrays(cands)
    all_idx = np.concatenate([fixed_idx, cand_idx])
    w_np = np.concatenate([w_fixed, x_init * w_cand])

    import scipy.sparse.linalg as spla
    L = weight_graph_lap_from_edges(all_idx, w_np, n)
    vals = spla.eigsh(L, k=8, sigma=-1e-4, which="LM", return_eigenvectors=False)
    spec = np.sort(vals)
    print("scipy bottom spectrum:", spec, flush=True)
    lam_true = float(spec[1])

    op = build_operator(all_idx, n)
    dtype = jnp.float32
    w = jnp.asarray(w_np, dtype)

    for q, maxit, inner in ((8, 40, 10), (16, 40, 10), (8, 40, 16)):
        X0 = jnp.asarray(_fiedler.default_block(n, q), dtype)

        def make(maxit=maxit, inner=inner):
            def f(w, X):
                return _fiedler.fiedler_pair_op(
                    op, w, X, tol=1e-9, maxiter=maxit, inner_iters=inner,
                )
            return jax.jit(f)

        f = make()
        t0 = time.perf_counter()
        res = jax.block_until_ready(f(w, X0))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = jax.block_until_ready(f(w, X0))
        warm = time.perf_counter() - t0
        v = np.asarray(res.X[:, 0], np.float64)
        v -= v.mean()
        lam_ref = float(v @ (L @ v) / (v @ v))
        print(
            f"q={q} inner={inner} maxiter={maxit}: warm={warm*1000:.0f}ms "
            f"iters={int(res.iters)} res={float(res.res):.2e} "
            f"lam={float(res.lam[0]):.8g} refined={lam_ref:.10g} "
            f"relerr={abs(lam_ref - lam_true)/lam_true:.2e} cold={cold:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
