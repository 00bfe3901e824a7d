"""Profile the per-FW-iteration FIXED costs of the banded path: BD
assembly (shear), chain-factor build, coarse build (apply@nc + cholesky),
and a full problem-step (eigensolve at 0 outers = all fixed costs)."""

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
from mac_tpu.ops.laplacian import build_operator, lap_tridiagonal_part
from mac_tpu.ops.tridiag import tridiag_ldl_auto

FLOOR = [0.0]


def timeit(name, fn, *args, reps=100):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            if out.shape == x.shape and out.dtype == x.dtype:
                return out * 0.999 + x * 0.001
            return x * 0.999 + 0.001 * jnp.mean(out).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    out = jax.block_until_ready(loop(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {max(best - FLOOR[0], 0.0)*1e6:.0f} us/op (raw {best*1e6:.0f})",
          flush=True)
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
    nc, s = bop.coarse_nc, bop.coarse_s
    print(f"nc={nc} s={s} half={bop.half}", flush=True)

    FLOOR[0] = timeit("floor", lambda x: x * 1.0001, w, reps=100)

    timeit("assemble_bd (shear)", lambda w: B.assemble_bd(bop, w), w, reps=50)

    # chain factor build
    def chain_fac(w):
        deg_rcm = jnp.einsum("bii->bi", BDw[bop.half]).reshape(bop.n_pad)[:n]
        d_nat = deg_rcm[bop.iperm]
        w_pad = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        e_nat = -w_pad[bop.chain_eid][: n - 1].astype(dt)
        fac = tridiag_ldl_auto(d_nat + 1e-5, e_nat)
        return fac.dp

    timeit("chain tridiag_ldl build", chain_fac, w, reps=50)

    # coarse pieces
    def coarse_apply(w):
        return B.banded_apply(bop, BDw, bop.R[:n].astype(dt))

    timeit("coarse: banded apply @ nc cols", coarse_apply, w, reps=20)

    LR = jax.jit(coarse_apply)(w)
    LRn = LR[bop.iperm]
    LRp = jnp.concatenate([LRn, jnp.zeros((nc * s - n, nc), dt)], axis=0)
    Lc = LRp.reshape(nc, s, nc).sum(axis=1)
    Lc = (Lc + Lc.T) / 2 + 2.0 * jnp.eye(nc, dtype=dt)

    def chol_inv(Lc):
        Rc = jnp.linalg.cholesky(Lc, upper=True)
        Rci = jax.scipy.linalg.solve_triangular(Rc, jnp.eye(nc, dtype=dt),
                                                lower=False)
        return Rci @ Rci.T

    timeit(f"coarse: cholesky+trisolve {nc}", chol_inv, Lc, reps=20)

    # full fixed cost: assemble + precond build + 1 precond apply
    V4 = jnp.asarray(np.random.RandomState(0).randn(n, 4), dt)

    def fixed_cost(w):
        BD2 = B.assemble_bd(bop, w)
        M = B.make_banded_precond(bop, BD2, w=w)
        return M(V4)

    timeit("assemble + precond build + 1 apply", fixed_cost, w, reps=20)


if __name__ == "__main__":
    main()
