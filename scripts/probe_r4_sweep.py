"""Why is the vmapped budget sweep ~200x slower per outer than the
serial solve? (round 4: sweep_warm 11.25 s at max_iters=5 on city10000
= ~0.7 s per batched outer across 8 lanes vs ~2.9 ms serial.)

Microbenches the vmapped forms of the per-outer ops (reps inside one
jitted fori_loop, identity floor subtracted) and the solve_sweep
marginal per FW iteration (max_iters 5 vs 10).

Usage: python scripts/probe_r4_sweep.py
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
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops import banded as B
from mac_tpu.ops.tridiag import tridiag_ldl_blocked, tridiag_solve_factored, TridiagFactor

FLOOR = [0.0]
LANES = 8


def timeit(name, fn, *args, reps=50):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            for lv in leaves:
                if lv.shape == x.shape and lv.dtype == x.dtype:
                    return lv * 0.999 + x * 0.001
            return x * 0.999 + 0.001 * jnp.mean(
                leaves[0].astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x)

    out = jax.block_until_ready(loop(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {max(best - FLOOR[0], 0.0) * 1e6:.0f} us/op "
          f"(raw {best * 1e6:.0f})", flush=True)
    return best


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    m = len(cands)
    k = m // 2
    x_init = NaiveGreedy(cands).subset(k)
    fi, wf = edges_to_arrays(fixed)
    ci, wc = edges_to_arrays(cands)
    idx = np.concatenate([fi, ci])
    w_np = np.concatenate([wf, x_init * wc])
    dt = jnp.float32

    bop, ridx = B.build_banded_rcm(idx, n, dtype=dt)
    rng = np.random.RandomState(0)
    wL = jnp.asarray(np.tile(w_np, (LANES, 1))
                     * (0.9 + 0.2 * rng.rand(LANES, 1)), dt)
    V = jnp.asarray(rng.normal(size=(LANES, bop.n, 4)), dt)

    fl = timeit("identity floor", lambda x: x * 1.0001, V, reps=100)
    FLOOR[0] = fl

    # vmapped assembly (XLA sheared fallback under vmap)
    timeit("vmap assemble_bd x8",
           lambda w_: jax.vmap(lambda ww: B.assemble_bd(bop, ww).deg)(w_),
           wL, reps=20)

    # vmapped banded apply
    BDs = jax.jit(jax.vmap(lambda ww: B.assemble_bd(bop, ww)))(wL)
    timeit("vmap banded_apply x8",
           lambda V_: jax.vmap(
               lambda bd_ut, bd_deg, v: B.banded_apply(
                   bop, B.BDRep(bd_ut, bd_deg), v))(BDs.ut, BDs.deg, V_),
           V, reps=50)

    # vmapped chain tridiag solve (custom_vmap -> associative scan)
    d = jnp.abs(jnp.asarray(rng.normal(size=(LANES, n)), dt)) + 1.0
    e = -jnp.abs(jnp.asarray(rng.normal(size=(LANES, n - 1)), dt)) * 0.3

    def tsolve(V_, d_, e_):
        def one(dd, ee, vv):
            f = tridiag_ldl_blocked(dd, ee, block=B.CHAIN_LDL_BLOCK)
            from mac_tpu.ops.tridiag import tridiag_solve_factored_fast
            return tridiag_solve_factored_fast(f, vv)
        return jax.vmap(one)(d_, e_, V_)

    timeit("vmap chainLDL+solve_fast x8", tsolve, V, d, e, reps=20)

    # scan-path solve alone (what the custom_vmap rule dispatches to)
    def tsolve_scan(V_, d_, e_):
        def one(dd, ee, vv):
            f = tridiag_ldl_blocked(dd, ee, block=B.CHAIN_LDL_BLOCK)
            return tridiag_solve_factored(f, vv)
        return jax.vmap(one)(d_, e_, V_)

    timeit("vmap chainLDL+solve_scan x8", tsolve_scan, V, d, e, reps=20)

    # solve_sweep marginal per FW iteration
    mac = MAC(fixed, cands, n)
    fracs = np.linspace(0.1, 0.5, LANES)
    ks = np.asarray([int(f * m) for f in fracs])
    for mi in (5, 10):
        mac.solve_sweep(ks, max_iters=mi)  # compile
        t0 = time.perf_counter()
        mac.solve_sweep(ks, max_iters=mi)
        print(f"solve_sweep max_iters={mi}: {time.perf_counter() - t0:.3f} s",
              flush=True)


if __name__ == "__main__":
    main()
