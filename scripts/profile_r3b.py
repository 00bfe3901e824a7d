"""Round-3b microbenchmarks: per-FW-step fixed costs + the additive
two-level preconditioner variant, on city10000 (TPU)."""

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
from mac_tpu.ops.cg import pcg_fixed
from mac_tpu.ops.tridiag import tridiag_ldl_blocked, tridiag_solve_factored_fast
from mac_tpu.optimization import constraints
from mac_tpu.utils import fiedler as _fiedler

FLOOR = [0.0]


def timeit(name, fn, *args, reps=200):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            acc = x
            for lv in leaves:
                if lv.shape == x.shape and lv.dtype == x.dtype:
                    return lv * 0.999 + x * 0.001
            return x * 0.999 + 0.001 * jnp.mean(leaves[0]).astype(x.dtype)
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
    w = jnp.asarray(w_np, dt)
    wc_j = jnp.asarray(wc, dt)
    BDw = jax.jit(lambda w: B.assemble_bd(bop, w))(w)
    V4 = jnp.asarray(_fiedler.default_block(n, 4), dt)
    g = jnp.asarray(np.random.RandomState(0).rand(len(wc)), dt)
    xj = jnp.asarray(x_init, dt)

    f = timeit("identity floor V4", lambda x: x * 1.0001, V4, reps=400)
    FLOOR[0] = f

    # --- per-FW-step fixed parts ---
    timeit("assemble_bd", lambda wv: B.assemble_bd(bop, wv).deg, w, reps=100)
    deg_rcm = BDw.deg.reshape(bop.n_pad)[:n]
    d_nat = deg_rcm[bop.iperm]
    dd = d_nat + 100 * jnp.finfo(dt).eps * jnp.max(d_nat)

    def ldl(wv):
        w_pad = jnp.concatenate([wv, jnp.zeros((1,), dt)])
        e_nat = -w_pad[bop.chain_eid][: n - 1].astype(dt)
        return tridiag_ldl_blocked(dd, e_nat, block=B.CHAIN_LDL_BLOCK).dp

    timeit(f"chain-LDL block{B.CHAIN_LDL_BLOCK}", ldl, w, reps=100)

    nc0, s0 = bop.coarse_nc, bop.coarse_s
    Rmat = (bop.agg[:n, None]
            == jnp.arange(nc0, dtype=jnp.int32)[None, :]).astype(dt)

    def coarse_lr(wv):
        BD2 = B.assemble_bd(bop, wv)
        return B.banded_apply(bop, BD2, Rmat,
                              precision=jax.lax.Precision.DEFAULT)

    timeit("assemble+LR apply(nc cols)", coarse_lr, w, reps=100)

    # Candidate replacement: Lc via the dense coarse incidence matmul
    # Lc = (w . Ec)^T @ Ec, Ec[e] = +-1 at the endpoint aggregates
    # (original-order aggregate = node_id // s). Exact same matrix as
    # R^T (L R); one (nc, m) @ (m, nc) MXU product instead of an
    # nc-column banded apply.
    a_e = idx[:, 0] // s0
    b_e = idx[:, 1] // s0
    m_all = len(a_e)
    Ec_np = np.zeros((m_all, nc0), np.float32)
    rows = np.arange(m_all)
    np.add.at(Ec_np, (rows, a_e), 1.0)
    np.add.at(Ec_np, (rows, b_e), -1.0)
    Ec = jnp.asarray(Ec_np, dt)

    def coarse_einc(wv):
        Ew = Ec * wv[:, None]
        return jnp.matmul(Ew.T, Ec, precision=jax.lax.Precision.DEFAULT)

    timeit("Lc via incidence matmul", coarse_einc, w, reps=100)
    # Parity check (loose: DEFAULT-precision products both sides).
    Lc_a = np.asarray(jax.jit(coarse_einc)(w), np.float64)
    LR = jax.jit(coarse_lr)(w)
    LRn = LR[bop.iperm]
    LRp = jnp.concatenate(
        [LRn, jnp.zeros((nc0 * s0 - n, nc0), dt)], axis=0)
    Lc_b = np.asarray(LRp.reshape(nc0, s0, nc0).sum(axis=1), np.float64)
    scale = max(np.abs(Lc_b).max(), 1e-30)
    print(f"Lc parity: max|diff|/max|Lc| = "
          f"{np.abs(Lc_a - Lc_b).max() / scale:.2e}", flush=True)

    # Full precond build: cold (chol) vs warm (NS).
    from mac_tpu.ops.banded import PrecondState

    ps0 = PrecondState(Lc_inv=jnp.eye(bop.coarse_nc, dtype=dt))

    def build(wv, use_prev):
        BD2 = B.assemble_bd(bop, wv)
        M, st = B.make_banded_precond(
            bop, BD2, w=wv, prev_state=ps0,
            use_prev=jnp.asarray(use_prev), return_state=True)
        return st.Lc_inv

    timeit("assemble+build precond COLD(chol)",
           lambda wv: build(wv, False), w, reps=50)
    timeit("assemble+build precond WARM(NS)",
           lambda wv: build(wv, True), w, reps=50)

    # FW-step misc.
    timeit("lax.top_k indicator (solve_subset_box_lp)",
           lambda gv: constraints.solve_subset_box_lp(gv, k), g, reps=100)
    u_idx = jnp.asarray(ci[:, 0].astype(np.int64))
    v_idx = jnp.asarray(ci[:, 1].astype(np.int64))

    def grad_fn(V):
        v = V[:, 0]
        d = v[u_idx] - v[v_idx]
        return wc_j * d * d

    timeit("gradient gather+mult", grad_fn, V4, reps=200)

    def wall(xv):
        mask = jnp.where(xv > 1e-10, xv, 0.0)
        return jnp.concatenate([jnp.asarray(wf, dt), mask * wc_j])

    timeit("mask+concat w_all", wall, xj, reps=200)

    # --- additive vs multiplicative precond ---
    M_mult = B.make_banded_precond(bop, BDw, w=w)
    timeit("V-cycle mult (n,4)", M_mult, V4)

    # Monkey-build additive: reuse make_banded_precond internals via the
    # returned closure family.
    Madd_full = B.make_banded_precond(bop, BDw, w=w, return_state=True)
    # call the additive through a tiny shim: rebuild with internal flag
    import types
    # direct: build both and fetch precond_additive via cell inspection is
    # fragile — instead time the additive pieces composed inline:
    w_pad = jnp.concatenate([w, jnp.zeros((1,), dt)])
    e_nat = -w_pad[bop.chain_eid][: n - 1].astype(dt)
    fac = tridiag_ldl_blocked(dd, e_nat, block=B.CHAIN_LDL_BLOCK)
    nc, s = bop.coarse_nc, bop.coarse_s
    Lc_inv = Madd_full[1].Lc_inv

    def precond_add(Bv):
        Bv = Bv - jnp.mean(Bv, axis=0, keepdims=True)
        Bn = Bv[bop.iperm]
        xn = tridiag_solve_factored_fast(fac, Bn)
        Bp = jnp.concatenate(
            [Bn, jnp.zeros((nc * s - n, Bv.shape[1]), dt)], axis=0)
        rc = Bp.reshape(nc, s, -1).sum(axis=1)
        xc = jnp.dot(Lc_inv, rc, preferred_element_type=dt)
        xn = xn + jnp.repeat(xc, s, axis=0)[:n]
        out = xn[bop.perm]
        return out - jnp.mean(out, axis=0, keepdims=True)

    timeit("V-cycle ADDITIVE (n,4)", precond_add, V4)

    apply_w = lambda Z: B.banded_apply(bop, BDw, Z)
    for it in (10, 12, 14):
        timeit(f"pcg_fixed {it} iters ADDITIVE",
               lambda V, i=it: pcg_fixed(apply_w, V, precond_add, iters=i),
               V4, reps=50)
    timeit("pcg_fixed 10 iters MULT",
           lambda V: pcg_fixed(apply_w, V, M_mult, iters=10), V4, reps=50)


if __name__ == "__main__":
    main()
