"""Round-3 microbenchmarks: dissect the banded-path V-cycle and the
per-FW fixed costs on city10000 (TPU).

Pattern: each op times inside one jitted fori_loop (reps amortize the
~26 ms dispatch floor), identity-body floor subtracted."""

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
from mac_tpu.ops.tridiag import (
    tridiag_ldl_blocked,
    tridiag_solve_factored_fast,
)
from mac_tpu.utils import fiedler as _fiedler

FLOOR = [0.0]


def timeit(name, fn, *args, reps=200):
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
    print(f"n={n} nb={bop.nb} ndiag={bop.ndiag} nc={bop.coarse_nc}")
    w = jnp.asarray(w_np, dt)
    BDw = jax.jit(lambda w: B.assemble_bd(bop, w))(w)
    V4 = jnp.asarray(_fiedler.default_block(n, 4), dt)

    f = timeit("identity floor", lambda x: x * 1.0001, V4, reps=400)
    FLOOR[0] = f

    # --- the V-cycle, dissected ---
    timeit("permute gather (n,4)", lambda V: V[bop.iperm] * 1.0, V4)
    deg_rcm = BDw.deg.reshape(bop.n_pad)[:n]
    d_nat = deg_rcm[bop.iperm]
    w_pad = jnp.concatenate([w, jnp.zeros((1,), dt)])
    e_nat = -w_pad[bop.chain_eid][: n - 1].astype(dt)
    dd = d_nat + 100 * jnp.finfo(dt).eps * jnp.max(d_nat)
    fac = tridiag_ldl_blocked(dd, e_nat, block=512)
    timeit("tridiag fused kernel (n,4)",
           lambda V: tridiag_solve_factored_fast(fac, V), V4)

    def smooth(Bv):
        Xn = tridiag_solve_factored_fast(fac, Bv[bop.iperm])
        return Xn[bop.perm]

    timeit("smooth = perm+tridiag+perm", smooth, V4)
    timeit("banded apply DEFAULT (n,4)",
           lambda V: B.banded_apply(bop, BDw, V,
                                    precision=jax.lax.Precision.DEFAULT), V4)
    timeit("banded apply HIGHEST (n,4)",
           lambda V: B.banded_apply(bop, BDw, V), V4)

    Minv = B.make_banded_precond(bop, BDw, w=w)
    timeit("full V-cycle precond (n,4)", Minv, V4)

    apply_w = lambda Z: B.banded_apply(bop, BDw, Z)
    for it in (4, 6, 8, 10):
        timeit(f"pcg_fixed {it} iters",
               lambda V, i=it: pcg_fixed(apply_w, V, Minv, iters=i),
               V4, reps=50)

    # --- per-FW fixed costs, dissected ---
    timeit("assemble_bd", lambda wv: B.assemble_bd(bop, wv).deg, w, reps=50)
    timeit("chain-LDL blocked512",
           lambda wv: tridiag_ldl_blocked(
               dd, -jnp.concatenate([wv, jnp.zeros((1,), dt)])[bop.chain_eid][: n - 1].astype(dt),
               block=512).dp, w, reps=50)

    def coarse_build(wv):
        BD2 = B.assemble_bd(bop, wv)
        LR = B.banded_apply(bop, BD2, bop.R[:n].astype(dt),
                            precision=jax.lax.Precision.DEFAULT)
        LRn = LR[bop.iperm]
        nc, s = bop.coarse_nc, bop.coarse_s
        LRp = jnp.concatenate(
            [LRn, jnp.zeros((nc * s - n, nc), dt)], axis=0)
        Lc = LRp.reshape(nc, s, nc).sum(axis=1)
        Lc = (Lc + Lc.T) / 2
        cshift = 2.0 * jnp.max(jnp.diag(Lc)) + 1.0
        jit_c = 1e-2 * (jnp.trace(Lc) / nc) + 100 * jnp.finfo(dt).eps
        Lc_reg = (Lc + (cshift / nc) * jnp.ones((nc, nc), dt)
                  + jit_c * jnp.eye(nc, dtype=dt))
        Rc = jnp.linalg.cholesky(Lc_reg, upper=True)
        Rc_inv = jax.scipy.linalg.solve_triangular(
            Rc, jnp.eye(nc, dtype=dt), lower=False)
        return Rc_inv @ Rc_inv.T

    timeit("coarse build (LR+Lc+chol+inv)", coarse_build, w, reps=50)

    def coarse_lr_only(wv):
        BD2 = B.assemble_bd(bop, wv)
        return B.banded_apply(bop, BD2, bop.R[:n].astype(dt),
                              precision=jax.lax.Precision.DEFAULT)

    timeit("  of which assemble+LR apply", coarse_lr_only, w, reps=50)

    def full_fixed(wv):
        BD2 = B.assemble_bd(bop, wv)
        M = B.make_banded_precond(bop, BD2, w=wv)
        return M(V4)

    timeit("assemble+precond build+1 apply", full_fixed, w, reps=20)


if __name__ == "__main__":
    main()
