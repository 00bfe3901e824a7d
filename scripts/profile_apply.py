"""Compare Laplacian-apply formulations on TPU for city10000:
A: current full-ELL gather (n x dmax rows)
B: chain-by-shift + by-edge loop gather + one scatter-add
C: chain-by-shift + compressed loop-ELL gather + one scatter-add
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
from mac_tpu.solvers import NaiveGreedy
from mac_tpu.utils import fiedler as _fiedler
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops.laplacian import build_operator, lap_apply


def timeit(name, fn, x, reps=200):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v) * 0.999 + v * 0.001, x)

    out = jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e6:.0f} us/op", flush=True)


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

    # --- reference output
    ref = np.asarray(lap_apply(op, w, V))

    # Host-side structure split.
    lo = all_idx.min(1)
    hi = all_idx.max(1)
    is_chain = (hi - lo) == 1
    chain_slot = lo[is_chain]
    chain_w_ids = np.nonzero(is_chain)[0]
    loop_ids = np.nonzero(~is_chain)[0]
    lu = all_idx[loop_ids, 0]
    lv = all_idx[loop_ids, 1]
    m_loop = len(loop_ids)
    print(f"m={len(w_np)} chain={is_chain.sum()} loop={m_loop}", flush=True)

    chain_slot_j = jnp.asarray(chain_slot)
    chain_ids_j = jnp.asarray(chain_w_ids)
    loop_ids_j = jnp.asarray(loop_ids)
    lu_j = jnp.asarray(lu)
    lv_j = jnp.asarray(lv)

    def chain_band(w):
        c = jnp.zeros((n - 1,), w.dtype)
        return c.at[chain_slot_j].add(w[chain_ids_j])

    def apply_B(V):
        c = chain_band(w)
        dV = V[:-1] - V[1:]
        t = c[:, None] * dV
        zero = jnp.zeros((1, V.shape[1]), V.dtype)
        out = jnp.concatenate([t, zero], 0) - jnp.concatenate([zero, t], 0)
        wl = w[loop_ids_j]
        tv = wl[:, None] * (V[lu_j] - V[lv_j])
        idx_cat = jnp.concatenate([lu_j, lv_j])
        val_cat = jnp.concatenate([tv, -tv], 0)
        return out.at[idx_cat].add(val_cat)

    outB = np.asarray(apply_B(V))
    print("B err:", np.abs(outB - ref).max() / np.abs(ref).max(), flush=True)

    # C: compressed loop-ELL
    loop_deg = np.zeros(n, np.int64)
    np.add.at(loop_deg, lu, 1)
    np.add.at(loop_deg, lv, 1)
    loop_nodes = np.nonzero(loop_deg > 0)[0]
    nl = len(loop_nodes)
    dl = int(loop_deg.max())
    node_pos = -np.ones(n, np.int64)
    node_pos[loop_nodes] = np.arange(nl)
    nbrc = np.zeros((nl, dl), np.int32)
    eidc = np.full((nl, dl), len(w_np), np.int32)
    cur = np.zeros(nl, np.int64)
    for t_, (a, b) in enumerate(zip(lu, lv)):
        pa, pb = node_pos[a], node_pos[b]
        nbrc[pa, cur[pa]] = b
        eidc[pa, cur[pa]] = loop_ids[t_]
        cur[pa] += 1
        nbrc[pb, cur[pb]] = a
        eidc[pb, cur[pb]] = loop_ids[t_]
        cur[pb] += 1
    print(f"nl={nl} dl={dl}", flush=True)
    loop_nodes_j = jnp.asarray(loop_nodes)
    nbrc_j = jnp.asarray(nbrc)
    eidc_j = jnp.asarray(eidc)

    def apply_C(V):
        c = chain_band(w)
        dV = V[:-1] - V[1:]
        t = c[:, None] * dV
        zero = jnp.zeros((1, V.shape[1]), V.dtype)
        out = jnp.concatenate([t, zero], 0) - jnp.concatenate([zero, t], 0)
        w_pad = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wt = w_pad[eidc_j]
        Vn = V[nbrc_j]
        Vs = V[loop_nodes_j]
        contrib = jnp.einsum("nd,ndq->nq", wt, Vs[:, None, :] - Vn)
        return out.at[loop_nodes_j].add(contrib)

    outC = np.asarray(apply_C(V))
    print("C err:", np.abs(outC - ref).max() / np.abs(ref).max(), flush=True)

    timeit("A full-ELL", lambda V: lap_apply(op, w, V), V)
    timeit("B chain-shift + by-edge scatter", apply_B, V)
    timeit("C chain-shift + compressed ELL", apply_C, V)


if __name__ == "__main__":
    main()
