"""Round-2 probe batch 2: Mosaic capability checks for the fused CG kernel.

P0: block-banded XLA apply with precision=HIGHEST (error + time)
P1: in-kernel reshape (8, n_pad) <-> (8, nb, 128) + lane-group reduce
P2: strided lane slice x[:, ::128]
P3: static-unroll banded apply kernel (64 bands) — compile time + runtime
P4: dynamic fori_loop banded apply (182 bands, dynamic rotate + row index)
P5: VMEM scratch ceilings 8 / 12 MB
P6: in-kernel matmul (8, n_pad) @ (n_pad, 128) f32 (Rmat-restrict form)
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*args))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e6:.0f} us/op (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)
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

    A = sp.coo_matrix((np.ones(m), (idx[:, 0], idx[:, 1])), shape=(n, n))
    perm = reverse_cuthill_mckee(sp.csr_matrix(A + A.T), symmetric_mode=True)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    ridx = inv[idx]
    lo = np.minimum(ridx[:, 0], ridx[:, 1])
    hi = np.maximum(ridx[:, 0], ridx[:, 1])
    d_off = hi - lo
    bw = int(d_off.max())
    BS = 128
    nb = -(-n // BS)
    n_pad = nb * BS
    print(f"n={n} m={m} bw={bw} nb={nb} n_pad={n_pad}", flush=True)

    # Band-weight table: wband[d-1, i] = sum of w_e over edges (i, i+d).
    wband_np = np.zeros((bw, n_pad), np.float32)
    np.add.at(wband_np, (d_off - 1, lo), w_np.astype(np.float32))
    wband = jnp.asarray(wband_np)

    # Oracle: f64 ELL apply on the RCM operator.
    q = 4
    rs = np.random.RandomState(0)
    t = np.linspace(0, 1, n)
    Vs = np.stack([np.sin((kk + 1) * np.pi * t) for kk in range(q)], 1)
    Vs += 0.01 * rs.normal(size=(n, q))
    op_r = build_operator(ridx.astype(np.int32), n)
    ref64 = np.asarray(lap_apply(op_r, jnp.asarray(w_np, jnp.float64),
                                 jnp.asarray(Vs, jnp.float64)))
    scale = np.abs(ref64).max()
    Vlm = jnp.asarray(np.pad(Vs.T, ((0, 4), (0, n_pad - n))), jnp.float32)  # (8, n_pad)

    # ---- P0: block-banded XLA apply, precision HIGHEST.
    half = 2
    ndiag = 5
    i64 = ridx[:, 0].astype(np.int64)
    j64 = ridx[:, 1].astype(np.int64)
    bi, bj = i64 // BS, j64 // BS

    def flat(b, o, r, c):
        return ((o + half) * nb + b) * BS * BS + r * BS + c

    fidx = np.concatenate([
        flat(bi, 0, i64 % BS, i64 % BS), flat(bj, 0, j64 % BS, j64 % BS),
        flat(bi, bj - bi, i64 % BS, j64 % BS), flat(bj, bi - bj, j64 % BS, i64 % BS)])
    sgn = np.concatenate([np.ones(m), np.ones(m), -np.ones(m), -np.ones(m)])
    BD = jnp.zeros((ndiag * nb * BS * BS,), jnp.float32).at[
        jnp.asarray(fidx)].add(jnp.tile(jnp.asarray(w_np, jnp.float32), 4)
                               * jnp.asarray(sgn, jnp.float32))
    BD = BD.reshape(ndiag, nb, BS, BS)
    Vp32 = jnp.asarray(np.pad(Vs, ((0, n_pad - n), (0, 0))), jnp.float32)

    def bapply_hi(V, BD):
        Vb = V.reshape(nb, BS, q)
        Vp = jnp.pad(Vb, ((half, half), (0, 0), (0, 0)))
        win = jnp.stack([Vp[o:o + nb] for o in range(ndiag)], 0)
        cb = jnp.mean(win, axis=(0, 2))[:, None, :]
        out = jnp.zeros_like(Vb)
        for o in range(ndiag):
            out = out + jnp.einsum("brc,bcq->brq", BD[o], Vp[o:o + nb] - cb,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        return out.reshape(n_pad, q)

    got = np.asarray(jax.jit(bapply_hi)(Vp32, BD))[:n]
    print(f"P0 bapply HIGHEST err: {np.abs(got - ref64).max()/scale:.2e}", flush=True)
    timeit("P0 bapply HIGHEST (n,4)", bapply_hi, Vp32, BD)

    # ---- P1: in-kernel reshape + lane-group reduce + matmul + broadcast back.
    def k_reshape(x_ref, lc_ref, o_ref):
        x = x_ref[:]                       # (8, n_pad)
        xb = x.reshape(8, nb, BS)
        rc = jnp.sum(xb, axis=2)           # (8, nb)
        yc = jnp.dot(rc, lc_ref[:], preferred_element_type=jnp.float32)
        yb = jnp.broadcast_to(yc[:, :, None], (8, nb, BS))
        o_ref[:] = yb.reshape(8, n_pad)

    Lc = jnp.asarray(rs.normal(size=(nb, nb)), jnp.float32)

    def p1(x, Lc):
        return pl.pallas_call(
            k_reshape,
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, Lc)

    try:
        out = jax.block_until_ready(jax.jit(p1)(Vlm, Lc))
        # correctness
        xb = np.asarray(Vlm).reshape(8, nb, BS)
        rc = xb.sum(2)
        expect = np.broadcast_to((rc @ np.asarray(Lc))[:, :, None], (8, nb, BS)).reshape(8, n_pad)
        print(f"P1 reshape+reduce+matmul: OK err={np.abs(np.asarray(out)-expect).max():.2e}", flush=True)
        timeit("P1 kernel", p1, Vlm, Lc)
    except Exception as e:
        print(f"P1 reshape+reduce+matmul: FAIL {str(e)[:250]}", flush=True)

    # ---- P2: strided lane slice.
    def k_stride(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, ::BS]

    def p2(x):
        return pl.pallas_call(
            k_stride,
            out_shape=jax.ShapeDtypeStruct((8, nb), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try:
        out = jax.block_until_ready(jax.jit(p2)(Vlm))
        expect = np.asarray(Vlm)[:, ::BS]
        print(f"P2 strided slice: OK err={np.abs(np.asarray(out)-expect).max():.2e}", flush=True)
    except Exception as e:
        print(f"P2 strided slice: FAIL {str(e)[:200]}", flush=True)

    # ---- P3: static-unroll banded apply (first 64 bands only, compile probe).
    def _roll(x, kk):
        return pltpu.roll(x, jnp.asarray(kk, jnp.int32), 1)

    def k_band_static(w_ref, v_ref, o_ref, *, nbands):
        v = v_ref[:]
        out = jnp.zeros_like(v)
        for dd in range(1, nbands + 1):
            wd = w_ref[dd - 1, :][None, :]
            tt = wd * (v - _roll(v, n_pad - dd))
            out = out + tt - _roll(tt, dd)
        o_ref[:] = out

    def p3(v, wb):
        return pl.pallas_call(
            functools.partial(k_band_static, nbands=64),
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(wb, v)

    timeit("P3 static 64-band apply", p3, Vlm, wband[:64])

    # ---- P4: dynamic-loop banded apply, all 182 bands.
    def k_band_dyn(w_ref, v_ref, o_ref):
        v = v_ref[:]

        def body(dd, out):
            wd = w_ref[pl.ds(dd - 1, 1), :]
            tt = wd * (v - pltpu.roll(v, (n_pad - dd).astype(jnp.int32), 1))
            return out + tt - pltpu.roll(tt, dd.astype(jnp.int32), 1)

        o_ref[:] = jax.lax.fori_loop(
            jnp.asarray(1, jnp.int32), jnp.asarray(bw + 1, jnp.int32),
            body, jnp.zeros_like(v))

    def p4(v, wb):
        return pl.pallas_call(
            k_band_dyn,
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(wb, v)

    try:
        out = jax.block_until_ready(jax.jit(p4)(Vlm, wband))
        got = np.asarray(out)[:q, :n].T
        print(f"P4 dynamic 182-band apply err: {np.abs(got - ref64).max()/scale:.2e}",
              flush=True)
        timeit("P4 dynamic 182-band apply", p4, Vlm, wband)
    except Exception as e:
        print(f"P4 dynamic apply: FAIL {str(e)[:250]}", flush=True)

    # ---- P5: VMEM ceilings.
    for mb in (8, 12):
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
            print(f"P5 VMEM scratch {mb} MB: OK", flush=True)
        except Exception as e:
            print(f"P5 VMEM scratch {mb} MB: FAIL {str(e)[:100]}", flush=True)

    # ---- P6: in-kernel (8, n_pad) @ (n_pad, 128) matmul.
    Rmat = jnp.asarray(rs.rand(n_pad, 128) > 0.5, jnp.float32)

    def k_mm(x_ref, r_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], r_ref[:], preferred_element_type=jnp.float32)

    def p6(x, R):
        return pl.pallas_call(
            k_mm,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, R)

    try:
        out = jax.block_until_ready(jax.jit(p6)(Vlm, Rmat))
        expect = np.asarray(Vlm) @ np.asarray(Rmat)
        print(f"P6 in-kernel matmul: OK relerr="
              f"{np.abs(np.asarray(out)-expect).max()/np.abs(expect).max():.2e}",
              flush=True)
        timeit("P6 in-kernel matmul", p6, Vlm, Rmat)
    except Exception as e:
        print(f"P6 in-kernel matmul: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
