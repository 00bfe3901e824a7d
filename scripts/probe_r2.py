"""Round-2 design probes on the real TPU: block-banded MXU apply (RCM),
lane-major layouts, RR dtype costs, VMEM ceiling. Pure measurement — not
shipped API."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import NaiveGreedy
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops.laplacian import build_operator, lap_apply


def timeit(name, fn, *args, reps=100):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            if out.shape == x.shape and out.dtype == x.dtype:
                return out * 0.999 + x * 0.001
            return x * 0.999 + 0.001 * jnp.mean(out).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    try:
        out = jax.block_until_ready(loop(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e6:.0f} us/op", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fi, wf = edges_to_arrays(fixed)
    ci, wc = edges_to_arrays(cands)
    idx = np.concatenate([fi, ci])
    w_np = np.concatenate([wf, x_init * wc])
    m = idx.shape[0]

    # RCM relabel.
    A = sp.coo_matrix((np.ones(m), (idx[:, 0], idx[:, 1])), shape=(n, n))
    perm = reverse_cuthill_mckee(sp.csr_matrix(A + A.T), symmetric_mode=True)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    ridx = inv[idx]  # RCM-relabeled endpoints
    bw = int(np.abs(ridx[:, 0] - ridx[:, 1]).max())
    BS = 128
    nb = -(-n // BS)
    n_pad = nb * BS
    ndiag = 2 * (bw // BS + 1) + 1  # block diagonals −2..+2 for bw<=255
    print(f"n={n} m={m} bw={bw} nb={nb} ndiag={ndiag} "
          f"backend={jax.default_backend()}", flush=True)

    # Flat scatter indices for BD (ndiag, nb, BS, BS), diag o-2 = bj-bi.
    i = ridx[:, 0].astype(np.int64)
    j = ridx[:, 1].astype(np.int64)
    half = ndiag // 2

    def flat(bi, o, r, c):
        return ((o + half) * nb + bi) * BS * BS + r * BS + c

    bi, bj = i // BS, j // BS
    fidx = np.concatenate([
        flat(bi, 0, i % BS, i % BS),            # (i,i) += w
        flat(bj, 0, j % BS, j % BS),            # (j,j) += w
        flat(bi, bj - bi, i % BS, j % BS),      # (i,j) -= w
        flat(bj, bi - bj, j % BS, i % BS),      # (j,i) -= w
    ])
    sgn = np.concatenate([np.ones(m), np.ones(m), -np.ones(m), -np.ones(m)])
    fidx_d = jnp.asarray(fidx)
    sgn_d = jnp.asarray(sgn, jnp.float32)

    def build_bd(w):
        vals = jnp.tile(w, 4) * sgn_d
        BD = jnp.zeros((ndiag * nb * BS * BS,), jnp.float32).at[fidx_d].add(vals)
        return BD.reshape(ndiag, nb, BS, BS)

    w32 = jnp.asarray(w_np, jnp.float32)
    t0 = time.perf_counter()
    BD = jax.block_until_ready(jax.jit(build_bd)(w32))
    print(f"BD build cold: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    BD = jax.block_until_ready(jax.jit(build_bd)(w32))
    print(f"BD build warm: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"({BD.nbytes/1e6:.0f} MB)", flush=True)

    # --- probe 1: block-banded MXU apply, node-major (n, q) state.
    q = 4

    def bapply_nm(V, BD):
        # V (n_pad, q) -> (n_pad, q); local centering for f32 stability.
        Vb = V.reshape(nb, BS, q)
        Vp = jnp.pad(Vb, ((half, half), (0, 0), (0, 0)))
        # c_b = mean of the 5-block neighborhood of row-block b.
        win = jnp.stack([Vp[o:o + nb] for o in range(ndiag)], 0)  # (5,nb,BS,q)
        cb = jnp.mean(win, axis=(0, 2), keepdims=False)[:, None, :]  # (nb,1,q)
        out = jnp.zeros_like(Vb)
        for o in range(ndiag):
            out = out + jnp.einsum(
                "brc,bcq->brq", BD[o], Vp[o:o + nb] - cb,
                preferred_element_type=jnp.float32)
        return out.reshape(n_pad, q)

    rs = np.random.RandomState(0)
    # Smooth-ish test vector: low-frequency modes in RCM coordinates.
    t = np.linspace(0, 1, n)
    Vs = np.stack([np.sin((kk + 1) * np.pi * t) for kk in range(q)], 1)
    Vs += 0.01 * rs.normal(size=(n, q))
    Vp32 = jnp.asarray(np.pad(Vs, ((0, n_pad - n), (0, 0))), jnp.float32)

    # Correctness vs ELL on RCM-relabeled operator (f64 oracle).
    op_r = build_operator(ridx.astype(np.int32), n)
    ref64 = np.asarray(lap_apply(op_r, jnp.asarray(w_np, jnp.float64),
                                 jnp.asarray(Vs, jnp.float64)))
    got = np.asarray(jax.jit(bapply_nm)(Vp32, BD))[:n]
    scale = np.abs(ref64).max()
    print(f"bapply_nm err vs f64 oracle: {np.abs(got - ref64).max()/scale:.2e} "
          f"(rel to max |LV|)", flush=True)
    ell32 = np.asarray(lap_apply(op_r, w32, jnp.asarray(Vs, jnp.float32)))
    print(f"ell f32   err vs f64 oracle: {np.abs(ell32 - ref64).max()/scale:.2e}",
          flush=True)

    timeit("bapply_nm (n,4)", bapply_nm, Vp32, BD)
    V12 = jnp.concatenate([Vp32] * 3, axis=1)

    def bapply_nm12(V, BD):
        Vb = V.reshape(nb, BS, 12)
        Vp = jnp.pad(Vb, ((half, half), (0, 0), (0, 0)))
        win = jnp.stack([Vp[o:o + nb] for o in range(ndiag)], 0)
        cb = jnp.mean(win, axis=(0, 2), keepdims=False)[:, None, :]
        out = jnp.zeros_like(Vb)
        for o in range(ndiag):
            out = out + jnp.einsum("brc,bcq->brq", BD[o], Vp[o:o + nb] - cb,
                                   preferred_element_type=jnp.float32)
        return out.reshape(n_pad, 12)

    timeit("bapply_nm (n,12)", bapply_nm12, V12, BD)

    # --- probe 2: lane-major (q, n) state with reshape to (q, nb, BS).
    Vlm = Vp32.T.reshape(q, nb, BS)

    def bapply_lm(V, BD):
        # V (q, nb, BS); out (q, nb, BS). einsum over lanes.
        Vp = jnp.pad(V, ((0, 0), (half, half), (0, 0)))
        win = jnp.stack([Vp[:, o:o + nb] for o in range(ndiag)], 0)
        cb = jnp.mean(win, axis=(0, 3), keepdims=False)[:, :, None]  # (q,nb,1)
        out = jnp.zeros_like(V)
        for o in range(ndiag):
            out = out + jnp.einsum("qbc,brc->qbr", Vp[:, o:o + nb] - cb, BD[o],
                                   preferred_element_type=jnp.float32)
        return out

    got2 = np.asarray(jax.jit(bapply_lm)(Vlm, BD)).reshape(q, n_pad).T[:n]
    print(f"bapply_lm err vs f64 oracle: {np.abs(got2 - ref64).max()/scale:.2e}",
          flush=True)
    timeit("bapply_lm (4,nb,128)", bapply_lm, Vlm, BD)

    # --- probe 3: RR-step dtype cost breakdown (12-dim basis).
    S = jnp.asarray(rs.normal(size=(n, 12)), jnp.float32)

    def gram64(S):
        S64 = S.astype(jnp.float64)
        return (S64.T @ S64).astype(jnp.float32)

    def gram32(S):
        return S.T @ S

    timeit("gram (n,12) f64", gram64, S)
    timeit("gram (n,12) f32", gram32, S)
    H32 = jnp.asarray(rs.normal(size=(12, 12)), jnp.float32)
    H32 = H32 @ H32.T + 12 * jnp.eye(12, dtype=jnp.float32)

    def eigh64(H):
        e, Y = jnp.linalg.eigh(H.astype(jnp.float64))
        return Y.astype(jnp.float32) * e[0].astype(jnp.float32)

    def eigh32(H):
        e, Y = jnp.linalg.eigh(H)
        return Y * e[0]

    timeit("eigh 12x12 f64", eigh64, H32)
    timeit("eigh 12x12 f32", eigh32, H32)

    def chol64(H):
        R = jnp.linalg.cholesky(H.astype(jnp.float64), upper=True)
        Ri = jax.scipy.linalg.solve_triangular(
            R, jnp.eye(12, dtype=jnp.float64), lower=False)
        return (Ri @ Ri.T).astype(jnp.float32)

    def chol32(H):
        R = jnp.linalg.cholesky(H, upper=True)
        Ri = jax.scipy.linalg.solve_triangular(
            R, jnp.eye(12, dtype=jnp.float32), lower=False)
        return Ri @ Ri.T

    timeit("chol+trisolve 12x12 f64", chol64, H32)
    timeit("chol+trisolve 12x12 f32", chol32, H32)

    # --- probe 4: VMEM ceiling (compile-only probes).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for mb in (16, 32, 64, 100):
        rows = mb * 1024 * 1024 // (128 * 4)

        def kern(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = scratch[0:8, :]

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
            )(jnp.ones((8, 128), jnp.float32))
            jax.block_until_ready(out)
            print(f"VMEM scratch {mb} MB: OK", flush=True)
        except Exception as e:
            print(f"VMEM scratch {mb} MB: FAIL {str(e)[:120]}", flush=True)
            break


if __name__ == "__main__":
    main()
