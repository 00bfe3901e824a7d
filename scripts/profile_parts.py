"""Microbenchmark the eigensolver's constituent ops on the TPU:
ELL apply, fused tridiag solve, V-cycle, RR step. Each timed as 100
repetitions inside one jitted fori_loop (amortizes dispatch)."""

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
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops.laplacian import build_operator, lap_apply, lap_tridiagonal_part
from mac_tpu.ops.tridiag import tridiag_ldl, tridiag_solve_factored, tridiag_solve_factored_fast
from mac_tpu.ops.twogrid import make_twogrid_precond
from mac_tpu.ops.lobpcg import _orth, _hi


def timeit(name, fn, *args, reps=100):
    @jax.jit
    def loop(*a):
        def body(i, x):
            out = fn(*([x] + list(a[1:])))
            return out * 0.999 + x * 0.001  # keep data dependence
        return jax.lax.fori_loop(0, reps, body, a[0])

    out = jax.block_until_ready(loop(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e6:.0f} us/op", flush=True)
    return dt


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fi, wf = edges_to_arrays(fixed)
    ci, wc = edges_to_arrays(cands)
    all_idx = np.concatenate([fi, ci])
    w_np = np.concatenate([wf, x_init * wc])
    op = build_operator(all_idx, n)
    dtype = jnp.float32
    w = jnp.asarray(w_np, dtype)
    q = 4
    V = jnp.asarray(_fiedler.default_block(n, q), dtype)

    print(f"n={n} m={len(w_np)} dmax={op.eid_tbl.shape[1]} backend="
          f"{jax.default_backend()}", flush=True)

    timeit("ell_apply (n,4)", lambda V: lap_apply(op, w, V), V)
    V12 = jnp.concatenate([V, V, V], axis=1)
    timeit("ell_apply (n,12)", lambda V: lap_apply(op, w, V), V12)

    d, e = lap_tridiagonal_part(op, w)
    fac = tridiag_ldl(d + 1e-5 * jnp.max(d), e)
    timeit("tridiag scan solve", lambda B: tridiag_solve_factored(fac, B), V)
    timeit("tridiag fused solve", lambda B: tridiag_solve_factored_fast(fac, B), V)

    pc = make_twogrid_precond(op, w, lambda X: lap_apply(op, w, X))
    timeit("twogrid V-cycle", pc, V)

    def rr(X):
        Q = _orth(X)
        AQ = lap_apply(op, w, Q)
        H = _hi(Q).T @ _hi(AQ)
        evals, C = jnp.linalg.eigh((H + H.T) / 2)
        return Q @ C.astype(dtype)

    timeit("RR step (orth+eigh)", rr, V12)

    # One full tracemin outer iteration equivalent: inner=10 CG.
    from mac_tpu.ops.cg import pcg_fixed

    def outer(X):
        Y = pcg_fixed(lambda Z: lap_apply(op, w, Z), X, pc, iters=10)
        return Y

    timeit("10-step inner CG (incl V-cycles)", outer, V, reps=20)


if __name__ == "__main__":
    main()
