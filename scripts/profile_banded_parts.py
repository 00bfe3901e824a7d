"""Microbenchmark the banded-path eigensolver constituents on TPU.

Times each op inside one jitted fori_loop with enough reps to amortize the
~26 ms per-dispatch floor of the tunneled TPU (measure the floor explicitly
with an identity body and subtract)."""

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
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops import banded as B
from mac_tpu.ops.laplacian import build_operator
from mac_tpu.ops.cg import pcg_fixed
from mac_tpu.ops.lobpcg import _orth, _hi, tracemin_fiedler
from mac_tpu.ops.tridiag import tridiag_ldl_auto, tridiag_solve_factored_fast
from mac_tpu.utils import fiedler as _fiedler

FLOOR = [0.0]


def timeit(name, fn, *args, reps=200):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            if (hasattr(out, "shape") and out.shape == x.shape
                    and out.dtype == x.dtype):
                return out * 0.999 + x * 0.001
            # Pytree outputs (e.g. BDRep): fold the first leaf's mean back
            # into the carry so the loop body is not dead code.
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x * 0.999 + 0.001 * jnp.mean(leaf).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    out = jax.block_until_ready(loop(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {max(best - FLOOR[0], 0.0)*1e6:.0f} us/op "
          f"(raw {best*1e6:.0f})", flush=True)
    return best


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fi, wf = edges_to_arrays(fixed)
    ci, wc = edges_to_arrays(cands)
    idx = np.concatenate([fi, ci])
    w_np = np.concatenate([wf, x_init * wc])
    dt = jnp.float32

    bop, ridx = B.build_banded_rcm(idx, n, dtype=dt)
    op = build_operator(ridx, n)
    w = jnp.asarray(w_np, dt)
    BDw = jax.jit(lambda w: B.assemble_bd(bop, w))(w)
    V4 = jnp.asarray(_fiedler.default_block(n, 4), dt)
    V12 = jnp.concatenate([V4] * 3, axis=1)

    # Dispatch floor.
    f = timeit("identity floor", lambda x: x * 1.0001, V4, reps=200)
    FLOOR[0] = f

    timeit("banded apply q4 HIGHEST", lambda V: B.banded_apply(bop, BDw, V), V4)
    timeit("banded apply q4 DEFAULT",
           lambda V: B.banded_apply(bop, BDw, V, precision=jax.lax.Precision.DEFAULT), V4)
    timeit("banded apply q12 HIGHEST", lambda V: B.banded_apply(bop, BDw, V), V12)
    timeit("permute gather q4", lambda V: V[bop.iperm] * 1.0, V4)
    timeit("permute gather q12", lambda V: V[bop.iperm] * 1.0, V12)

    from mac_tpu.ops.laplacian import lap_tridiagonal_part
    d_, e_ = lap_tridiagonal_part(op, w)
    fac = tridiag_ldl_auto(d_ + 1e-5 * jnp.max(d_), e_)
    timeit("tridiag fused q4", lambda V: tridiag_solve_factored_fast(fac, V), V4)

    pc = jax.jit(lambda w: B.make_banded_precond(bop, B.assemble_bd(bop, w), w=w))
    Minv = B.make_banded_precond(bop, BDw, w=w)
    timeit("precond apply q4", Minv, V4)
    timeit("10-iter pcg_fixed (banded+precond)",
           lambda V: pcg_fixed(lambda Z: B.banded_apply(bop, BDw, Z), V, Minv, iters=10),
           V4, reps=50)

    def rr64(X):
        Q = _orth(X)
        AQ = B.banded_apply(bop, BDw, Q)
        H = _hi(Q).T @ _hi(AQ)
        evals, C = jnp.linalg.eigh((H + H.T) / 2)
        return Q @ C.astype(dt)

    def rr32(X):
        nrm = jnp.linalg.norm(X, axis=0, keepdims=True)
        Xn = X / jnp.maximum(nrm, 1e-30)
        G = Xn.T @ Xn
        R = jnp.linalg.cholesky(G + 1e-6 * jnp.eye(G.shape[0], dtype=dt), upper=True)
        Ri = jax.scipy.linalg.solve_triangular(R, jnp.eye(G.shape[0], dtype=dt), lower=False)
        Q = Xn @ Ri
        AQ = B.banded_apply(bop, BDw, Q)
        H = Q.T @ AQ
        evals, C = jnp.linalg.eigh((H + H.T) / 2)
        return Q @ C

    timeit("RR step f64 coeffs q12", rr64, V12, reps=50)
    timeit("RR step f32 coeffs q12", rr32, V12, reps=50)

    timeit("assemble_bd (auto)", lambda w: B.assemble_bd(bop, w), w, reps=50)
    timeit("assemble_bd fused=True",
           lambda w: B.assemble_bd(bop, w, fused=True), w, reps=50)
    timeit("assemble_bd fused=False (XLA)",
           lambda w: B.assemble_bd(bop, w, fused=False), w, reps=50)

    from mac_tpu.ops.tridiag import tridiag_ldl_blocked
    timeit("chain tridiag_ldl_blocked(128)",
           lambda d: tridiag_ldl_blocked(d, e_, block=128).dp, d_, reps=50)

    def build_and_touch(w):
        BD2 = B.assemble_bd(bop, w)
        M = B.make_banded_precond(bop, BD2, w=w)
        return M(V4)

    timeit("assemble+precond-build+1 apply", build_and_touch, w, reps=20)

    # Whole eigensolve at fixed iteration budget.
    def eig10(w):
        BD2 = B.assemble_bd(bop, w)
        M = B.make_banded_precond(bop, BD2, w=w)
        res = tracemin_fiedler(
            lambda V: B.banded_apply(bop, BDw, V), V4,
            jnp.asarray(2.0 * 25000.0, dt), M, tol=1e-12, maxiter=10,
            inner_iters=10, rel_tol=1e-12)
        return res.X

    t = timeit("eigensolve 10 outers (incl build)", eig10, w, reps=5)
    print(f"  -> per-outer (rough): {(t - FLOOR[0]) / 10 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
