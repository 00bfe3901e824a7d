"""Probe assemble_bd sub-pieces + f32 prescaled Moebius LDL on TPU."""

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
from mac_tpu.ops.tridiag import tridiag_ldl, tridiag_ldl_blocked

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
    print(f"{name}: {max(best - FLOOR[0], 0.0)*1e6:.0f} us/op", flush=True)
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
    n_pad, half, nb = bop.n_pad, bop.half, bop.nb
    BS = 128
    Dp = half * BS
    W = BS * (half + 2)

    FLOOR[0] = timeit("floor", lambda x: x * 1.0001, w, reps=200)

    # pieces
    timeit("gather (n_pad,256)", lambda w: -jnp.concatenate(
        [w, jnp.zeros((1,), dt)])[bop.lbt_tbl], w, reps=50)
    tbl184 = np.asarray(bop.lbt_tbl)[:, :184]
    tbl184_d = jnp.asarray(tbl184)
    timeit("gather (n_pad,184)", lambda w: -jnp.concatenate(
        [w, jnp.zeros((1,), dt)])[tbl184_d], w, reps=50)

    Wt = -jnp.concatenate([w, jnp.zeros((1,), dt)])[bop.lbt_tbl]

    def shear_only(Wt):
        Ap = jnp.pad(Wt, ((0, 0), (BS + 1, W - BS - 1 - Dp)))
        r = (jnp.arange(n_pad, dtype=jnp.int32) % BS)[:, None]
        Sh = Ap
        kk = 1
        while kk < BS:
            Sh = jnp.where((r & kk) > 0, jnp.roll(Sh, kk, axis=1), Sh)
            kk *= 2
        return Sh

    timeit("shear only", shear_only, Wt, reps=50)
    Sh = jax.jit(shear_only)(Wt)

    def upper_slices(Sh):
        ups = [Sh[:, BS * (t + 1): BS * (t + 2)].reshape(nb, BS, BS)
               for t in range(half + 1)]
        return ups[0] + ups[1] + ups[2]

    timeit("upper slices+reshape", upper_slices, Sh, reps=50)

    def lower_build(Sh):
        ups = [Sh[:, BS * (t + 1): BS * (t + 2)].reshape(nb, BS, BS)
               for t in range(half + 1)]
        out = ups[0]
        zblk = jnp.zeros((1, BS, BS), dt)
        for t in range(1, half + 1):
            low = jnp.swapaxes(ups[t], 1, 2)[: nb - t]
            out = out + jnp.concatenate(
                [jnp.broadcast_to(zblk, (t, BS, BS)), low], axis=0)
        return out + jnp.swapaxes(ups[0], 1, 2)

    timeit("lower build (3 transposes)", lower_build, Sh, reps=50)

    def stack_deg(Sh):
        BD = B.assemble_bd(bop, w)
        return BD

    timeit("full assemble_bd", lambda w: B.assemble_bd(bop, w), w, reps=50)

    # f32 prescaled Moebius LDL vs f64
    d_, e_ = lap_tridiagonal_part(op, w)

    def ldl_f32_prescaled(d, e):
        scale = jnp.max(d)
        dn = (d / scale).astype(jnp.float32)
        en = (e / scale).astype(jnp.float32)
        n_ = dn.shape[0]
        e2 = jnp.concatenate([jnp.zeros((1,), jnp.float32), en * en])
        M = jnp.stack([
            jnp.stack([dn, -e2], axis=-1),
            jnp.stack([jnp.ones_like(dn), jnp.zeros_like(dn)], axis=-1),
        ], axis=-2)

        def comb(a, b):
            m_ = jnp.einsum("...ij,...jk->...ik", b, a)
            sc = jnp.max(jnp.abs(m_), axis=(-2, -1), keepdims=True)
            sc = jnp.where(sc == 0, 1.0, sc)
            return m_ / sc

        P = jax.lax.associative_scan(comb, M, axis=0)
        dp = P[:, 0, 0] / P[:, 1, 0]
        return dp * scale

    f64fac = tridiag_ldl(d_, e_)
    got = jax.jit(ldl_f32_prescaled)(d_, e_)
    ref = np.asarray(f64fac.dp)
    rel = np.abs(np.asarray(got) - ref) / np.abs(ref)
    print(f"f32 prescaled LDL: finite={bool(np.all(np.isfinite(np.asarray(got))))} "
          f"max rel err={rel.max():.2e}", flush=True)
    timeit("LDL f64 scan", lambda d: tridiag_ldl(d, e_).dp, d_, reps=20)
    timeit("LDL f32 prescaled scan", lambda d: ldl_f32_prescaled(d, e_), d_, reps=20)
    timeit("LDL f64 blocked(512)",
           lambda d: tridiag_ldl_blocked(d, e_, block=512).dp, d_, reps=20)


if __name__ == "__main__":
    main()
